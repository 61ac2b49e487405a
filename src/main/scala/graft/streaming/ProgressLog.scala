package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** In-engine streaming observability: capture each micro-batch's
  * StreamingQueryProgress into a bounded in-memory log, queryable as a
  * DataFrame — the numbers that drive production alerting (rows/batch,
  * batch duration, state size) without shipping JSON to an external
  * system first. The reference has no metrics surface at all; Spark
  * emits these on every batch, this just retains them.
  *
  * Bounded on purpose: a resident query at a 5 s trigger emits ~17k
  * progress events/day — the log keeps the newest `maxBatches` and drops
  * the oldest, so a forgotten listener can never leak the driver. The
  * buffer is tiny scalar rows; this never touches executor data paths. */
class ProgressLog(maxBatches: Int = 1000) extends StreamingQueryListener {
  import scala.jdk.CollectionConverters._

  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[(String, Long, Long, Long, Long, Long)]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows =
      if (p.stateOperators == null) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    buf.addLast((p.id.toString, p.batchId, p.numInputRows, duration,
      stateRows, parseTs(p.timestamp)))
    while (buf.size() > maxBatches) buf.pollFirst()
  }

  private def parseTs(iso: String): Long =
    try java.time.Instant.parse(iso).toEpochMilli catch { case _: Exception => 0L }

  /** Snapshot as a DataFrame: (query_id, batch_id, input_rows,
    * trigger_ms, state_rows, ts_ms). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.iterator().asScala.toSeq
      .toDF("query_id", "batch_id", "input_rows", "trigger_ms", "state_rows", "ts_ms")
  }
}
