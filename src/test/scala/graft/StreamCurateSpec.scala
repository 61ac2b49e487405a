package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Pipeline
import graft.streaming.StreamCurate

/** Streaming FineWeb curation: the persisted-model batch path must equal
  * the oracled derive-thresholds path when fit on the same corpus, a
  * single streamed batch must equal the persisted-model batch path, the
  * lifetime source cap must hold across micro-batches, and a replayed
  * batch must change nothing.
  */
class StreamCurateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")

  private def fitModel(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toString + "/m"
    Pipeline.fitCurationModel(docs, dir)
    dir
  }

  // comparison view: all output columns except the within-run rank
  // (lifetime rank in the stream vs batch rank differ by contract)
  private def view(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select("doc_id", "lang", "source", "n_tokens", "n_removed",
        "avg_surprisal", "ppl_bucket")
      .collect().map(_.toString).sorted

  test("fromModel == fineWebCurate when the model is fit on the same corpus") {
    val modelDir = fitModel("sc_model_eq")
    val derived = Pipeline.fineWebCurate(docs)
    val fromModel = Pipeline.fineWebCurateFromModel(docs, modelDir)
    assert(view(fromModel).sameElements(view(derived)))
    // including the rank column — same salt, same survivors, same rank
    val a = derived.collect().map(_.toString).sorted
    val b = fromModel.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("single streamed batch == fineWebCurateFromModel") {
    val modelDir = fitModel("sc_model_st")
    val outDir = Files.createTempDirectory("sc_out").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sc_ledger").toString + "/l"
    val ckpt = Files.createTempDirectory("sc_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String)]
    val q = StreamCurate.start(
      input.toDF().toDF("doc_id", "lang", "source", "text"),
      outDir, ledgerDir, modelDir, ckpt)
    try {
      input.addData(docs.select("doc_id", "lang", "source", "text")
        .as[(Long, String, String, String)].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamCurate.curated(spark, outDir)
    val batch = Pipeline.fineWebCurateFromModel(docs, modelDir)
    assert(view(streamed).sameElements(view(batch)))
  }

  test("lifetime source cap holds across micro-batches; replay changes nothing") {
    val modelDir = fitModel("sc_model_mb")
    val outDir = Files.createTempDirectory("sc_out2").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sc_ledger2").toString + "/l"

    val all = docs.select("doc_id", "lang", "source", "text")
    val b0 = all.where(col("doc_id") % 2 === 0)
    val b1 = all.where(col("doc_id") % 2 === 1)
    StreamCurate.curateBatch(b0, 0L, outDir, ledgerDir, modelDir)
    StreamCurate.curateBatch(b1, 1L, outDir, ledgerDir, modelDir)

    val out = StreamCurate.curated(spark, outDir)
    val perSource = out.groupBy("source").count().select("count").as[Long].collect()
    assert(perSource.nonEmpty && perSource.forall(_ <= 12),
      s"lifetime cap violated: ${perSource.toList}")
    assert(out.where(col("ppl_bucket") === "tail").count() == 0)
    // batch-0 admissions constrain batch-1: sources capped in batch 0
    // admit nothing more in batch 1 (ledger-driven)
    val before = out.collect().map(_.toString).sorted

    // replay batch 1: dynamic partition overwrite + pruned ledger read
    // must re-derive the identical admitted set
    StreamCurate.curateBatch(b1, 1L, outDir, ledgerDir, modelDir)
    val after = StreamCurate.curated(spark, outDir).collect().map(_.toString).sorted
    assert(after.sameElements(before), "replayed batch changed the output")
  }

  test("empty micro-batch is a no-op") {
    val modelDir = fitModel("sc_model_e")
    val outDir = Files.createTempDirectory("sc_out3").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sc_ledger3").toString + "/l"
    StreamCurate.curateBatch(
      docs.select("doc_id", "lang", "source", "text").limit(0),
      0L, outDir, ledgerDir, modelDir)
    assert(!new java.io.File(outDir).exists())
  }
}
