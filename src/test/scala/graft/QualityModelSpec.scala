package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

/** Learned quality scoring (FineWeb-Edu shape): planted high/low-quality
  * docs must separate, the scan-side expression must equal the
  * relational scoring it replaces, shrinkage must pull unseen buckets to
  * the global mean, and the no-evidence rule must drop gram-less docs.
  */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 256 // small grid keeps the fixtures collision-dense but fast

  // two gram textures: "educational" vs "spam" vocabularies
  private def hiText(i: Int) = s"thorough exposition of theorem $i with careful prose derivation"
  private def loText(i: Int) = s"click buy now win$i casino bonus free spam offer"

  private def labeled = (
    (1 to 20).map(i => (5L, hiText(i))) ++
    (1 to 20).map(i => (0L, loText(i)))
  ).toDF("label", "text")

  test("planted separation: high-texture docs outscore low-texture docs") {
    val w = QualityModel.collectWeights(QualityModel.train(labeled, B), B)
    val probe = Seq(
      (1L, "careful exposition of a theorem with prose"),
      (2L, "win casino bonus click spam")).toDF("doc_id", "text")
    val got = QualityModel.score(probe, w).select("doc_id", "avg_w")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) > got(2L),
      s"high-texture doc must outscore low-texture: $got")
    // and the margin is substantial on these disjoint vocabularies
    assert(got(1L) - got(2L) > 10000L, s"weak separation: $got")
  }

  test("scan-side scoring equals the relational explode/join/agg form") {
    val model = QualityModel.train(labeled, B)
    val w = QualityModel.collectWeights(model, B)
    val docs = (1 to 30).map(i =>
      (i.toLong, if (i % 2 == 0) hiText(i) else loText(i))).toDF("doc_id", "text")
    val fast = QualityModel.score(docs, w)
      .select("doc_id", "n_feats", "score_sum").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val relational = docs
      .select(col("doc_id"),
        explode(graft.expr.Exprs.charGramBuckets(lower(col("text")), B)).as("bucket"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_sum"))
      .select("doc_id", "n_feats", "score_sum").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(fast.sameElements(relational))
  }

  test("shrinkage: unseen buckets carry exactly the scaled global-mean weight") {
    // wide grid so unseen buckets certainly exist at this fixture size
    val B2 = 8192
    // lbar exactly as train() derives it, from the gram stream
    val g = labeled.select(col("label"),
      explode(graft.expr.Exprs.charGramBuckets(lower(col("text")), B2)).as("b"))
    val (gls, gc) = g.agg(sum(col("label")), count(lit(1)))
      .as[(Long, Long)].collect().head
    val lbar = gls / gc
    val unseen = QualityModel.train(labeled, B2)
      .join(g.groupBy(col("b").as("bucket")).agg(count(lit(1)).as("c")),
        Seq("bucket"), "left_anti")
      .select("w").distinct().as[Long].collect()
    assert(unseen.length == 1 && unseen.head == 10000L * lbar,
      s"unseen-bucket weight must be scale*lbar: ${unseen.toList} vs ${10000L * lbar}")
  }

  test("no-evidence docs drop (empty, single char, single astral codepoint)") {
    val w = QualityModel.collectWeights(QualityModel.train(labeled, B), B)
    val docs = Seq((1L, ""), (2L, "x"), (3L, "𝄞"), (4L, "ok fine")).toDF("doc_id", "text")
    val kept = QualityModel.score(docs, w).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L))
  }

  test("qualityTiers: planted classes land in the right tiers, tiers value-contiguous") {
    // corpus: thirds with high / low / neutral-mix textures
    val corpus = (
      (1 to 30).map(i => (i.toLong, hiText(i))) ++
      (31 to 60).map(i => (i.toLong, loText(i))) ++
      (61 to 90).map(i => (i.toLong, s"plain neutral sentence number $i nothing special"))
    ).toDF("doc_id", "text")
    val got = QualityModel.qualityTiers(corpus, labeled, B)
      .select("doc_id", "avg_w", "q_tier").as[(Long, Long, String)].collect()
    val byTier = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert((1 to 30).forall(i => byTier("high").contains(i.toLong)),
      s"hi docs not all high: ${byTier.view.mapValues(_.size).toMap}")
    assert((31 to 60).forall(i => byTier("low").contains(i.toLong)),
      s"lo docs not all low: ${byTier.view.mapValues(_.size).toMap}")
    // tiers are contiguous in score order (value thresholds)
    val sorted = got.sortBy(_._2)
    val tierSeq = sorted.map(_._3)
    val lowEnd = tierSeq.lastIndexOf("low")
    val midStart = tierSeq.indexOf("medium")
    val midEnd = tierSeq.lastIndexOf("medium")
    val hiStart = tierSeq.indexOf("high")
    assert(lowEnd < midStart && midEnd < hiStart,
      s"tiers must be contiguous: lowEnd=$lowEnd midStart=$midStart midEnd=$midEnd hiStart=$hiStart")
  }
}
