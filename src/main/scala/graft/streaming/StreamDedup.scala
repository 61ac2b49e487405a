package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact streaming deduplication by key within the watermark horizon —
  * the in-engine equivalent of the reference's receiver-side idempotency
  * (external-api/app.py:6-12 dedups HTTP posts by Idempotency-Key): CDC
  * redeliveries and micro-batch replays collapse to one row BEFORE the
  * sinks instead of at each receiver.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * evicts it once the watermark passes — bounded state, unlike plain
  * `dropDuplicates` on a stream which remembers every key forever. The
  * horizon is the replay window you need to tolerate (Kafka redelivery +
  * restart gap), not data retention. */
object StreamDedup {

  def byKey(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
            tsCol: String = "event_ts", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
