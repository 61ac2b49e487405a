package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Kmv
import graft.streaming.StreamKmv

/** Streaming KMV cardinality: stream == batch sketch, replay
  * idempotency, empty-batch no-op. */
class StreamKmvSpec extends SparkTestBase {
  import spark.implicits._

  test("stream == batch: merged per-batch sketches equal the one-shot sketch") {
    val dir = Files.createTempDirectory("skmv").toString + "/sk"
    val ckpt = Files.createTempDirectory("skmv_ckpt").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = StreamKmv.start(input.toDF().toDF("x"), "x", 64, dir, ckpt)
    try {
      input.addData(1L to 300L: _*)
      q.processAllAvailable()
      input.addData(200L to 600L: _*) // overlaps batch 0
      q.processAllAvailable()
      input.addData(601L to 900L: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamKmv.lifetimeSketch(spark, dir, 64)
      .as[Long].collect().sorted.toSeq
    val direct = Kmv.sketch((1L to 900L).toDF("x"), "x", 64)
      .as[Long].collect().sorted.toSeq
    assert(streamed == direct)
    val est = StreamKmv.estimate(spark, dir, 64).head()
    assert(est.getLong(0) == 64L)
    assert(est.getLong(2) == Kmv.estimate(
      Kmv.sketch((1L to 900L).toDF("x"), "x", 64), 64).head().getLong(2))
  }

  test("replay idempotency: re-running a batch changes nothing") {
    val dir = Files.createTempDirectory("skmv_r").toString + "/sk"
    StreamKmv.sketchBatch((1L to 100L).toDF("x"), 0L, "x", 16, dir)
    StreamKmv.sketchBatch((50L to 200L).toDF("x"), 1L, "x", 16, dir)
    val before = StreamKmv.lifetimeSketch(spark, dir, 16)
      .as[Long].collect().sorted.toSeq
    StreamKmv.sketchBatch((50L to 200L).toDF("x"), 1L, "x", 16, dir) // replay
    val after = StreamKmv.lifetimeSketch(spark, dir, 16)
      .as[Long].collect().sorted.toSeq
    assert(before == after)
    // and only two ledger partitions exist
    assert(spark.read.parquet(dir).select("_batch").distinct().count() == 2)
  }

  test("estimate before any batch landed: empty sketch, not an error") {
    val dir = Files.createTempDirectory("skmv_w").toString + "/never_written"
    val est = StreamKmv.estimate(spark, dir, 8).head()
    assert(est.getLong(0) == 0L) // n_kept
    assert(est.isNullAt(1))      // kth_hash
    assert(est.getLong(2) == 0L) // est_distinct
  }

  test("empty batch: no partition written") {
    val dir = Files.createTempDirectory("skmv_e").toString + "/sk"
    StreamKmv.sketchBatch((1L to 10L).toDF("x"), 0L, "x", 8, dir)
    StreamKmv.sketchBatch((1L to 10L).toDF("x").where($"x" < 0), 1L, "x", 8, dir)
    assert(spark.read.parquet(dir).select("_batch").distinct().count() == 1)
  }
}
