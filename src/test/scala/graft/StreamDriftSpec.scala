package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Quality
import graft.streaming.StreamDrift

/** Streaming drift monitor: EXACT stream == batch (counts are
  * additive), replay idempotency, fixed-edge discipline, warm-up. */
class StreamDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def mkRows(n: Int, skewA: Boolean): Seq[(String, Double)] =
    (0 until n).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      // the MINORITY group a drifts high in the skewed batches (a
      // drifting majority drags the pooled distribution with it and
      // shows LESS divergence than the unchanged minority — the report
      // measures divergence from the pool, so plant the minority)
      val v = if (g == "a" && skewA) 900.0 + i % 50 else (i * 37 % 1000).toDouble
      (g, v)
    }

  test("report over any batch prefix == batch quantileDriftWithEdges on the union") {
    val edgesDir = Files.createTempDirectory("sdr_e").toString + "/edges"
    val ledger = Files.createTempDirectory("sdr_l").toString + "/led"
    val ckpt = Files.createTempDirectory("sdr_c").toString
    // fit on a reference cut; edges stay fixed for every later batch
    val reference = mkRows(900, skewA = false).toDF("src", "x")
    StreamDrift.fitEdges(reference, "x", edgesDir)
    val edges = spark.read.parquet(edgesDir).orderBy("i")
      .collect().map(_.getDouble(1)).toSeq
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = StreamDrift.start(input.toDF().toDF("src", "x"),
      "src", "x", edgesDir, ledger, ckpt)
    val batches = Seq(mkRows(300, skewA = false), mkRows(300, skewA = true),
      mkRows(200, skewA = true))
    try {
      var fed = Seq.empty[(String, Double)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        fed = fed ++ b
        val streamed = StreamDrift.report(spark, ledger, "src")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
        val batch = Quality.quantileDriftWithEdges(
          fed.toDF("src", "x"), "src", "x", edges)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
        assert(streamed == batch,
          s"after ${fed.size} rows: stream $streamed != batch $batch")
      }
    } finally q.stop()
    // the planted minority skew drifts group a hardest
    val fin = StreamDrift.report(spark, ledger, "src").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(fin("a")._2 && fin("a")._1 > fin("b")._1)
  }

  test("replayed batch rewrites identical counts; totals unchanged") {
    val edgesDir = Files.createTempDirectory("sdr_e2").toString + "/edges"
    val ledger = Files.createTempDirectory("sdr_l2").toString + "/led"
    StreamDrift.saveEdges(spark, Seq(250.0, 500.0, 750.0), edgesDir)
    StreamDrift.countBatch(mkRows(200, skewA = false).toDF("src", "x"),
      0L, "src", "x", edgesDir, ledger)
    StreamDrift.countBatch(mkRows(150, skewA = true).toDF("src", "x"),
      1L, "src", "x", edgesDir, ledger)
    val before = StreamDrift.report(spark, ledger, "src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    StreamDrift.countBatch(mkRows(150, skewA = true).toDF("src", "x"),
      1L, "src", "x", edgesDir, ledger) // replay
    val after = StreamDrift.report(spark, ledger, "src")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before)
    assert(spark.read.parquet(ledger).select("_batch").distinct().count() == 2)
  }

  test("warm-up: empty ledger -> empty report, not an error") {
    val ledger = Files.createTempDirectory("sdr_w").toString + "/never"
    assert(StreamDrift.report(spark, ledger, "src").count() == 0)
  }
}
