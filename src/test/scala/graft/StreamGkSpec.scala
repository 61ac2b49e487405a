package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamGk

/** Streaming GK quantile ledger: rank bounds on the folded lifetime
  * summary, deterministic re-reads, replay idempotency, warm-up NaN. */
class StreamGkSpec extends SparkTestBase {
  import spark.implicits._

  private val eps = 0.01

  test("lifetime quantiles satisfy rank bounds over three skewed batches") {
    val dir = Files.createTempDirectory("sgk").toString + "/led"
    val ckpt = Files.createTempDirectory("sgk_ckpt").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Double]
    val q = StreamGk.start(input.toDF().toDF("x"), "x", eps, dir, ckpt)
    val b1 = (1 to 4000).map(i => ((i.toLong * i) % 997L).toDouble)
    val b2 = (1 to 100).map(_.toDouble * 5000) // far tail, tiny batch
    val b3 = (1 to 4000).map(i => (i % 13).toDouble) // heavy dups
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (b1 ++ b2 ++ b3).sorted
    val n = all.length
    val got = StreamGk.quantiles(spark, dir, eps, Seq(0.1, 0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((p, v) <- got) {
      val r = math.max(1L, math.ceil(p * n).toLong)
      val rLo = all.count(_ < v).toLong + 1
      val rHi = all.count(_ <= v).toLong
      // merged bound: eps per level is preserved (absolute uncertainty
      // adds), +1 per flush batch — allow 2x slack to stay un-flaky
      val slack = (2 * eps * n).toLong + 3
      assert(rLo - slack <= r && r <= rHi + slack,
        s"p=$p: $v rank [$rLo,$rHi], want $r +/- $slack")
    }
    // deterministic: a second read folds to the identical answers
    val again = StreamGk.quantiles(spark, dir, eps, Seq(0.1, 0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("replayed batch rewrites identical content; summary unchanged") {
    val dir = Files.createTempDirectory("sgk_r").toString + "/led"
    StreamGk.summaryBatch((1 to 500).map(_.toDouble).toDF("x"), 0L, "x", eps, dir)
    StreamGk.summaryBatch((300 to 900).map(_.toDouble).toDF("x"), 1L, "x", eps, dir)
    val before = StreamGk.quantiles(spark, dir, eps, Seq(0.25, 0.5, 0.75))
      .collect().map(_.getDouble(1)).toSeq
    StreamGk.summaryBatch((300 to 900).map(_.toDouble).toDF("x"), 1L, "x", eps, dir)
    val after = StreamGk.quantiles(spark, dir, eps, Seq(0.25, 0.5, 0.75))
      .collect().map(_.getDouble(1)).toSeq
    assert(after == before)
    assert(spark.read.parquet(dir).select("_batch").distinct().count() == 2)
  }

  test("warm-up: no ledger yet -> empty summary, NaN quantiles") {
    val dir = Files.createTempDirectory("sgk_w").toString + "/never"
    val got = StreamGk.quantiles(spark, dir, eps, Seq(0.5)).head()
    assert(got.getDouble(1).isNaN)
  }

  test("ledger stays bounded: tuple rows per batch ~ (1/eps) log(eps n), not n") {
    val dir = Files.createTempDirectory("sgk_b").toString + "/led"
    StreamGk.summaryBatch((1 to 200000).map(_.toDouble).toDF("x"), 0L, "x", eps, dir)
    val rows = spark.read.parquet(dir).count()
    assert(rows < 3000, s"ledger blew up: $rows tuple rows for 200k values")
  }
}
