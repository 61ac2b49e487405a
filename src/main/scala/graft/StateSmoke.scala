package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-state footprint smoke: how many bytes of RocksDB state does
  * the transformWithState sessionizer hold per open session? Drives K
  * distinct keys (one open session each — nothing closes, so state is
  * exactly K entries) through SessionizeTws with changelog checkpointing,
  * then sizes the checkpoint's state directory on disk. The per-key cost
  * is the number that lets a capacity plan go from "N million concurrent
  * users" to "GB of state per executor" — the design claim in
  * SessionizeTws's Scaladoc (constant state per key: four longs + row
  * overhead) made measurable. Writes only under /tmp.
  * Usage: runMain graft.StateSmoke [K ...]  (default: 10000 100000) */
object StateSmoke {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10000, 100000)
    val spark = Conf.ensure(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def dirBytes(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum
      finally s.close()
    }

    for (k <- ks) {
      val root = Files.createTempDirectory(s"graft-state-$k")
      val input = MemoryStream[(Long, Timestamp, Long)]
      val q = streaming.SessionizeTws.sessions(
        input.toDF().toDF("event_id", "ts", "user_id"), gapMinutes = 60)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .format("noop").start()
      try {
        val t0 = System.nanoTime()
        // two events per key in one batch (exercises the update path),
        // all within the gap -> K open sessions, zero closed
        val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
        input.addData((0 until k).map(i =>
          (i.toLong, new Timestamp(base + (i % 60) * 1000L), i.toLong)): _*)
        q.processAllAvailable()
        input.addData((0 until k).map(i =>
          (k + i.toLong, new Timestamp(base + 600000L + (i % 60) * 1000L), i.toLong)): _*)
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        val state = dirBytes(Path.of(s"$root/ckpt/state"))
        println(f"K=$k%d open sessions: state dir ${state / 1024.0 / 1024.0}%.1f MiB " +
          f"(${state.toDouble / k}%.0f bytes/key), ${2 * k / secs}%.0f events/s updates")
      } finally q.stop()
    }
    spark.stop()
  }
}
