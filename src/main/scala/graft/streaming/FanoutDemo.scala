package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.Conf
import graft.sinks.TtlLeaderboard

/** Runnable end-to-end demo of the resident fan-out query over the
  * file-drop source (the local stand-in for Kafka — same downstream plan):
  * drops Debezium envelopes into a watched dir, runs the stream, prints
  * what reached each sink. Usage: `sbt "runMain graft.streaming.FanoutDemo"`. */
object FanoutDemo {
  def main(args: Array[String]): Unit = {
    val spark = Conf.ensure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-demo").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    def envelope(id: Long, contentId: String, eventType: String, durationMs: Int) =
      s"""{"payload":{"after":{"id":$id,"content_id":"$contentId","user_id":"u-$id","event_type":"$eventType","event_ts":"2024-01-01 10:0$id:00","duration_ms":$durationMs,"device":"web","raw_payload":"{}"},"op":"c"}}"""

    // the smoke.sh seed scenario (FIXTURES.md §A) + an unmatched content
    Files.write(Paths.get(s"$inDir/batch1.json"), java.util.Arrays.asList(
      envelope(1, "c-1", "play", 60000),
      envelope(2, "c-1", "finish", 180000),
      envelope(3, "c-9", "click", 5000)))

    val dim = Seq(("c-1", "podcast", Some(1800))).toDF("content_id", "content_type", "length_seconds")
    val lb = new TtlLeaderboard()
    val cfg = Fanout.Config(
      checkpointDir = s"$root/ckpt",
      analyticsDir = Some(s"$root/analytics"),
      leaderboard = Some(lb),
      triggerMs = 100L)
    val q = Fanout.start(Sources.fileJson(spark, inDir), dim, cfg)
    q.processAllAvailable()
    q.stop()

    println("=== analytics sink (parquet, month-partitioned) ===")
    spark.read.parquet(s"$root/analytics")
      .select("event_id", "content_id", "content_type", "engagement_seconds",
        "engagement_pct", "event_month")
      .orderBy("event_id").show(false)
    println(s"=== leaderboard top-k === ${lb.topK(10)}")
    println(s"demo output under $root")
    spark.stop()
  }
}
