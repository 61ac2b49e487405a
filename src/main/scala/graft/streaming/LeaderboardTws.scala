package graft.streaming

import java.time.Duration
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The reference's Redis-TTL leaderboard (INCRBY + EXPIRE,
  * pipeline/app.py:89-99) as NATIVE engine state: per-key counters in a
  * transformWithState ValueState with a TTLConfig. Matches the reference's
  * semantics exactly — each touch increments and resets the key's clock,
  * untouched keys age out after `ttl` — but the state lives in the
  * RocksDB store with changelog checkpointing instead of an external
  * Redis: no network sink, recovery for free from the checkpoint, and
  * state capacity bounded by disk rather than a cache cluster.
  *
  * Compare sinks/TtlLeaderboard (the executor-push external-store shape,
  * kept because the reference's consumers read Redis): same counters, two
  * deployment topologies.
  *
  * Emits (key, running count) on every update (Update mode); a reader
  * materializes top-k with a plain window/orderBy over the latest value
  * per key.
  *
  * Operational caveat: TimeMode.ProcessingTime makes the engine schedule
  * micro-batches continuously (empty ones advance the TTL clock), so
  * `processAllAvailable`/Trigger.AvailableNow never quiesce on this
  * query — run it with a processing-time trigger and poll the sink (see
  * LeaderboardTwsSpec). Empty batches touch no keys and emit nothing.
  */
object LeaderboardTws {

  case class Delta(key: String, cnt: Long)
  case class KeyCount(key: String, cnt: Long)

  class Processor(ttl: Duration)
      extends StatefulProcessor[String, Delta, KeyCount] {
    @transient private var st: ValueState[java.lang.Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTLConfig: state not updated within `ttl` (processing time) is
      // dropped — exactly EXPIRE-on-touch, applied by the store itself
      st = getHandle.getValueState[java.lang.Long]("cnt", Encoders.LONG, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Delta],
                                 timers: TimerValues): Iterator[KeyCount] = {
      var add = 0L
      rows.foreach(r => add += r.cnt)
      val cur: Long = if (st.exists()) st.get() else 0L
      val next = cur + add
      st.update(next)
      Iterator.single(KeyCount(key, next))
    }
  }

  /** The reference's ZREVRANGE read path (scripts/smoke.sh:31), native:
    * materialize the CURRENT top-k from the Update-mode emission log,
    * where each row is (seq, key, cnt) and `seq` orders a key's
    * emissions (the foreachBatch batchId of the write). Latest count per
    * key via a per-key window, then global TakeOrderedAndProject — one
    * keyed shuffle plus the same top-k shape as ops/Aggregate.leaderboard,
    * so the view stays cheap however long the log grows; compact the log
    * with ops/Cdc.latestImage when it outgrows the view. */
  def topKView(updates: DataFrame, k: Int = 10,
               seqCol: String = "seq", keyCol: String = "key",
               cntCol: String = "cnt"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cnt desc tiebreak: if a replayed foreachBatch ever appends the same
    // (key, seq) twice, the surviving row is deterministic (counts are
    // monotone per key, so the larger one is also the more complete one)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(cntCol).desc)
    updates
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .orderBy(col(cntCol).desc, col(keyCol).asc)
      .limit(k)
      .select(col(keyCol), col(cntCol))
  }

  /** Per-key TTL'd counts over a stream; pre-aggregates each micro-batch
    * per key before touching state (one state op per touched key). */
  def counts(events: DataFrame, keyCol: String, ttl: Duration): Dataset[KeyCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"), lit(1L).as("cnt"))
      .as[Delta]
      .groupByKey(_.key)
      .transformWithState(new Processor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update(),
        Encoders.product[KeyCount])
  }
}
