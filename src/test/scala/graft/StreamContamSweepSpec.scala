package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, Retrieval}
import graft.streaming.StreamContamSweep

/** Streaming composed decontamination gate: stream == batch
  * value-for-value against a direct contaminationGate run, every
  * verdict class fires, the frozen-BM25 threshold separates a
  * one-term brush from a term-soup suspect, replay idempotency,
  * empty-batch no-op. */
class StreamContamSweepSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, Array[Float])]): DataFrame =
    rows.toDF("doc_id", "text", "embedding")

  private val benchText = "alpha beta gamma delta epsilon zeta"
  private val bench = Seq((100L, benchText)).toDF("bench_id", "text")
  private val benchVecs = Seq((200L, Array(1f, 0f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  // reference snapshot the BM25 stats freeze from (not the stream)
  private val reference = docs(Seq(
    (50L, "alpha beta gamma delta epsilon zeta", Array(0f, 0f, 0f, 1f)),
    (51L, "some plain filler words here", Array(0f, 0f, 0f, 1f)),
    (52L, "more unrelated reference prose", Array(0f, 0f, 0f, 1f)),
    (53L, "alpha appears once here too", Array(0f, 0f, 0f, 1f))))

  private val wave1 = Seq(
    // verbatim bench copy: lexical (2/2 grams) even though BM25 + cos
    // would also fire — precedence pins the strongest class
    (1L, benchText, Array(1f, 0f, 0f, 0f)),
    // probe twin: semantic (cos 1.0), text shares nothing
    (2L, "red yellow green blue paint", Array(2f, 0f, 0f, 0f)),
    // term soup: all six bench terms but zero shared 5-grams -> the
    // triage leg alone flags it
    (3L, "alpha only beta only gamma only delta only epsilon only zeta",
      Array(0f, 1f, 0f, 0f)))
  private val wave2 = Seq(
    (4L, "totally unrelated clean words now", Array(0f, 0f, 1f, 0f)),
    // a single-term brush must stay clean under the threshold
    (5L, "alpha unrelated filler completely different topic",
      Array(0f, 1f, 1f, 0f)))

  private lazy val frozen =
    Retrieval.bm25Frozen(reference, bench, queryIdCol = "bench_id")
      .localCheckpoint(true)

  /** Threshold strictly between doc 5's one-term brush and doc 3's
    * term soup — computed from the frozen table so the pin survives
    * idf arithmetic changes. */
  private lazy val minScoreFx: Long = {
    val s = Retrieval.bm25ScoreFrozen(docs(wave1 ++ wave2), frozen)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(3L) > s(5L), "term soup must outscore the one-term brush")
    (s(3L) + s(5L)) / 2
  }

  test("stream == batch: verdict classes, splits, and threshold separation") {
    val root = Files.createTempDirectory("scsweep").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Array[Float])]
    val stream = input.toDF().toDF("doc_id", "text", "embedding")
    val q = StreamContamSweep.start(stream, bench, benchVecs, frozen,
      s"$root/c", s"$root/q", s"$root/ck", minScoreFx, minCos = 0.8)
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val direct = Pipeline.contaminationGate(docs(wave1 ++ wave2), bench,
      benchVecs, frozen, minScoreFx, minCos = 0.8)
    val directQuar = direct.where(!col("kept"))
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    val gotQuar = StreamContamSweep.quarantine(spark, s"$root/q")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("verdict")).toMap
    assert(gotQuar == directQuar, "quarantine must equal the batch verdict")
    assert(gotQuar == Map(1L -> "lexical", 2L -> "semantic",
      3L -> "bm25_suspect"))
    val gotCorpus = StreamContamSweep.corpus(spark, s"$root/c").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotCorpus == Set(4L, 5L), "every doc lands on exactly one side")
  }

  test("a probe whose id collides with a doc id still flags it (independent namespaces)") {
    // the review-pass fix: semanticContamination's self-pair guard is
    // for benches drawn FROM the corpus; an external eval probe that
    // happens to share doc 7's id is a legitimate comparison, and the
    // gate must not fail open on it
    val collidingProbe = Seq((7L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val doc = Seq((7L, "totally innocuous words here",
      Array(0f, 2f, 0f, 0f))) // cos 1.0 with the probe, same id
    val v = Pipeline.contaminationGate(docs(doc), bench, collidingProbe,
      frozen, minScoreFx, minCos = 0.8)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(v == Map(7L -> "semantic"),
      "an id collision must not hide a semantic hit")
  }

  test("replayed batch rewrites identical partitions; empty batch is a no-op") {
    val root = Files.createTempDirectory("scsweep_r").toString
    def run(b: Seq[(Long, String, Array[Float])], id: Long) =
      StreamContamSweep.gateBatch(docs(b), id, bench, benchVecs, frozen,
        s"$root/c", s"$root/q", minScoreFx, minCos = 0.8)
    run(wave1, 0L); run(wave2, 1L)
    def state() = (
      StreamContamSweep.corpus(spark, s"$root/c").collect()
        .map(_.getAs[Long]("doc_id")).toSet,
      StreamContamSweep.quarantine(spark, s"$root/q").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict")))
        .toSet)
    val before = state()
    run(wave1, 0L) // replay
    assert(state() == before)
    // wave1 is all-quarantine and wave2 all-clean, so each side holds
    // exactly its one batch partition — the replay rewrote, not appended
    assert(spark.read.parquet(s"$root/q").select("_batch")
      .distinct().collect().map(_.get(0).toString.toLong).toSet == Set(0L))
    run(Seq.empty, 2L) // empty: must not write a _batch=2
    assert(state() == before)
    assert(spark.read.parquet(s"$root/c").select("_batch")
      .distinct().collect().map(_.get(0).toString.toLong).toSet == Set(1L))
  }
}
