package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** Outbound HTTP notification sink (reference pipeline/app.py:102-108):
  * one POST per enriched row with body {event_id, content_id, event_type}
  * and header `Idempotency-Key: <event_id>`, 1.5 s timeout, errors
  * swallowed (at-most-once per attempt; batch replay re-posts and the
  * receiver dedups on the key — external-api/app.py:6-12).
  *
  * Unlike the reference (driver-side collect + loop), rows are posted from
  * the executors: `postBatch` runs a `foreachPartition` with one pooled
  * HttpClient per partition, so at scale the fan-out parallelism is the
  * partition count, the driver never materializes the batch, and a slow
  * receiver back-pressures only its partition. */
object HttpSink {

  /** Global error counter (best-effort observability, like the reference's
    * swallowed exceptions; a production build would use a metrics sink). */
  val errors = new AtomicLong(0L)

  case class Config(endpoint: String, timeoutMs: Int = 1500)

  private def jsonBody(eventId: Long, contentId: String, eventType: String): String = {
    def q(s: String) = if (s == null) "null" else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"event_id":$eventId,"content_id":${q(contentId)},"event_type":${q(eventType)}}"""
  }

  private def post(client: HttpClient, cfg: Config, eventId: Long,
                   contentId: String, eventType: String): Unit =
    try {
      val req = HttpRequest.newBuilder(URI.create(cfg.endpoint))
        .timeout(Duration.ofMillis(cfg.timeoutMs))
        .header("Content-Type", "application/json")
        .header("Idempotency-Key", eventId.toString)
        .POST(HttpRequest.BodyPublishers.ofString(jsonBody(eventId, contentId, eventType)))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding())
      ()
    } catch {
      // swallow only ordinary failures (connect refused, timeout, 5xx
      // mapped to exceptions): fatal errors (OOM) must propagate, and an
      // interrupt means Spark is cancelling the task — restore the flag
      // and rethrow so cancellation isn't counted as a sink error
      case ie: InterruptedException =>
        Thread.currentThread().interrupt(); throw ie
      case scala.util.control.NonFatal(_) => errors.incrementAndGet(); ()
    }

  /** Executor-side batch fan-out: one client per partition, row-at-a-time
    * posts (the receiver contract is per-event idempotency keys). */
  def postBatch(batch: DataFrame, cfg: Config): Unit =
    batch.select(col("event_id").cast("long"), col("content_id").cast("string"),
        col("event_type").cast("string"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val client = HttpClient.newBuilder()
          .connectTimeout(Duration.ofMillis(cfg.timeoutMs)).build()
        rows.foreach { r =>
          post(client, cfg, r.getLong(0), r.getString(1), r.getString(2))
        }
      }

  /** `writeStream.foreach(...)` form for direct streaming use without
    * foreachBatch. Expects (event_id, content_id, event_type) columns. */
  class Writer(cfg: Config) extends ForeachWriter[Row] {
    @transient private var client: HttpClient = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      client = HttpClient.newBuilder().connectTimeout(Duration.ofMillis(cfg.timeoutMs)).build()
      true
    }
    override def process(r: Row): Unit =
      post(client, cfg, r.getAs[Long]("event_id"),
        r.getAs[String]("content_id"), r.getAs[String]("event_type"))
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
