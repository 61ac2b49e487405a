package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's aggregation layer (SURVEY.md §2.4) re-expressed in
  * Spark instead of Redis TTL tricks:
  *   A1 sliding 10-minute count per key  (Redis INCRBY + EXPIRE 600)
  *   A2 top-k leaderboard                 (ZSET top10m, ZREVRANGE 0 9)
  * plus the ops query `ORDER BY event_ts DESC LIMIT 5` (README.md:216-220).
  *
  * Batch-verifiable forms below filter to the trailing window relative to
  * max(ts) — the streaming forms live in graft.streaming.Fanout using
  * window()+watermark.
  *
  * Scale notes: the max(ts) is a single-row aggregate broadcast into the
  * filter (no driver collect); the count groupBy map-side combines before
  * its shuffle; top-k is TakeOrderedAndProject (per-partition heaps, no
  * full sort).
  */
object Aggregate {

  /** A1 batch form: events in the trailing `windowMinutes` (relative to the
    * max second-truncated ts), counted per key. ts comparisons are
    * second-truncated so nanosecond-vs-microsecond source precision cannot
    * change membership (FIXTURES.md oracle gotcha).
    */
  def slidingCount(events: DataFrame, keyCol: String, tsCol: String,
                   windowMinutes: Int = 10): DataFrame = {
    val sec = date_trunc("second", col(tsCol))
    val mx = events.agg(max(date_trunc("second", col(tsCol))).as("_mx"))
    events
      .join(broadcast(mx))
      .where(sec >= col("_mx") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .groupBy(col(keyCol).cast("string").as("content_id"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** A2: top-k leaderboard over all events, deterministic tie-break on key. */
  def leaderboard(events: DataFrame, keyCol: String, k: Int = 10): DataFrame =
    events
      .groupBy(col(keyCol).cast("string").as("content_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("content_id").asc)
      .limit(k)

  /** Ops query: latest N events (README.md:216-220). Ordered and emitted at
    * millisecond truncation for cross-engine determinism.
    */
  def recent(events: DataFrame, tsCol: String, n: Int = 5): DataFrame =
    events
      .withColumn("ts_ms", date_trunc("millisecond", col(tsCol)))
      .orderBy(col("ts_ms").desc, col("event_id").asc)
      .limit(n)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
}
