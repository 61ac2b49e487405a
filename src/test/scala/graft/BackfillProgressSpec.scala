package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.{Backfill, ProgressLog}

class BackfillProgressSpec extends SparkTestBase {
  import spark.implicits._

  test("Backfill.drain: processes the backlog, terminates, resumes incrementally") {
    val srcDir = Files.createTempDirectory("bf_src").toString
    val outDir = Files.createTempDirectory("bf_out").toString + "/data"
    val ckpt = Files.createTempDirectory("bf_ckpt").toString

    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    // rate limiting: the 100 TB point — the backlog drains in bounded
    // micro-batches, not one giant batch
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withColumn("v2", upper(col("v")))

    val b1 = Backfill.drain(stream, ckpt) { (batch, _) =>
      batch.write.mode("append").parquet(outDir)
    }
    assert(b1 >= 1, s"expected at least one batch, got $b1")
    assert(spark.read.parquet(outDir).count() == 50)

    // nothing new: the drained checkpoint means a re-run is a no-op
    Backfill.drain(stream, ckpt)((b, _) => b.write.mode("append").parquet(outDir))
    assert(spark.read.parquet(outDir).count() == 50)

    // late-arriving files: only the delta is processed
    (51 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(srcDir)
    Backfill.drain(stream, ckpt)((b, _) => b.write.mode("append").parquet(outDir))
    val out = spark.read.parquet(outDir)
    assert(out.count() == 60)
    assert(out.select("v2").as[String].collect().forall(_.startsWith("V")))
  }

  test("ProgressLog: per-batch rows recorded, bounded retention") {
    implicit val ctx = spark.sqlContext
    val log = new ProgressLog(maxBatches = 2)
    spark.streams.addListener(log)
    try {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = input.toDF().writeStream.format("noop").start()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L)
      q.processAllAvailable()
      input.addData(5L, 6L)
      q.processAllAvailable()
      q.stop()
      // listener events are async; wait for the bus to drain
      var tries = 0
      def rows() = log.toDF(spark)
        .where(col("input_rows") > 0).select("input_rows").as[Long].collect()
      while (!rows().contains(2L) && tries < 50) { Thread.sleep(100); tries += 1 }
      val got = rows().toSeq
      // retention is bounded at 2 entries, and the newest data batch
      // (5,6 -> 2 rows) survived; the first batch (3 rows) was evicted
      assert(log.toDF(spark).count() <= 2 && got.contains(2L) && !got.contains(3L),
        s"got $got")
    } finally spark.streams.removeListener(log)
  }
}
