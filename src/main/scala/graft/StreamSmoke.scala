package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.sinks.TtlLeaderboard
import graft.streaming.{Fanout, Sources}

/** End-to-end streaming throughput smoke: N Debezium envelopes through the
  * full resident query (parse -> broadcast enrich -> parquet analytics +
  * leaderboard) in `files` micro-batches. The reference's published number
  * is a <5 s end-to-end LATENCY SLO on 2-row batches (README.md:99); this
  * measures sustained events/s on the same pipeline shape. Writes only
  * under /tmp. Usage: runMain graft.StreamSmoke [nEvents] [files] */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val files = if (args.length > 1) args(1).toInt else 10
    val spark = Conf.ensure(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-streamsmoke").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val perFile = n / files
    (0 until files).foreach { f =>
      val sb = new StringBuilder(perFile * 200)
      var i = f * perFile
      while (i < (f + 1) * perFile) {
        val cid = s"c-${i % 1000}"
        sb.append(s"""{"payload":{"after":{"id":$i,"content_id":"$cid","user_id":"u-$i","event_type":"play","event_ts":"2024-01-01 10:00:${i % 60}","duration_ms":${i % 100000},"device":"web","raw_payload":"{}"},"op":"c"}}""")
          .append('\n')
        i += 1
      }
      Files.writeString(Paths.get(s"$inDir/b$f.json"), sb.toString)
    }
    val dim = spark.range(1000).selectExpr("concat('c-', id) content_id",
      "'podcast' content_type", "cast(1800 as int) length_seconds")
    val lb = new TtlLeaderboard()
    val cfg = Fanout.Config(checkpointDir = s"$root/ckpt",
      analyticsDir = Some(s"$root/analytics"), leaderboard = Some(lb), triggerMs = 10L)
    // one file per trigger => `files` genuine micro-batches
    val src = spark.readStream.option("maxFilesPerTrigger", 1).text(inDir)
      .selectExpr("value as json")
    val t0 = System.nanoTime()
    val q = Fanout.start(src, dim, cfg)
    q.processAllAvailable()
    q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val written = spark.read.parquet(s"$root/analytics").count()
    println(f"streamed $written events in $secs%.1f s (${written / secs}%.0f events/s, $files micro-batches, top=${lb.topK(1)})")
    spark.stop()
  }
}
