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

  // ---------------------------------------------- embedding linear probe

  test("embedding probe: quantized dot pinned by hand; planted direction recovered") {
    // quantization: floor(x*1024 + 0.5) — check a positive, a negative,
    // and an exact-boundary value through QuantDot directly
    val one = Seq((1L, Array(0.5f, -0.5f, 0.0029296875f))) // last = 3/1024
      .toDF("vec_id", "embedding")
    val s1 = one.select(graft.expr.Exprs.quantDot(col("embedding"),
      Seq(1L, 1L, 1L), 1024L).as("s")).as[Long].head()
    // q = 512, -512 (floor(-512+0.5) = floor(-511.5) = -512), 3
    assert(s1 == 512L - 512L + 3L)
    // planted direction: y = sign of dim 0; the probe must put dominant
    // positive weight on dim 0 and score-separate unseen vectors
    val rnd = new scala.util.Random(7)
    val train = (1 to 200).map { i =>
      val v = Array.tabulate(8)(_ => (rnd.nextFloat() - 0.5f))
      (v, if (v(0) > 0) 1L else -1L)
    }.toDF("embedding", "y")
    val w = QualityModel.embeddingProbeWeights(train, dim = 8)
    assert(w(0) > 0 && w.zipWithIndex.filter(_._2 != 0).forall(t => math.abs(t._1) < w(0)),
      s"dim-0 weight must dominate: $w")
    val test = (1 to 100).map { i =>
      val v = Array.tabulate(8)(_ => (rnd.nextFloat() - 0.5f)); (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val scored = QualityModel.embeddingProbeScore(test, w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val truth = test.collect().map(r =>
      r.getLong(0) -> (r.getSeq[Float](1).head > 0)).toMap
    val agree = truth.count { case (id, t) => scored(id) == t }
    assert(agree >= 90, s"probe agreement too low: $agree/100")
  }

  test("embedding probe: dimension mismatch drops the row, not the job") {
    val w = Seq(1L, 2L, 3L)
    val mixed = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(1f, 2f)))
      .toDF("vec_id", "embedding")
    val kept = QualityModel.embeddingProbeScore(mixed, w)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("embedding probe scoring plan: one scan, zero exchanges") {
    val test = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val plan = QualityModel.embeddingProbeScore(test, Seq(1L, 1L, 1L))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"probe scoring must be scan-side:\n$plan")
  }

  test("embedding probe: double-typed vectors score identically to float (VectorReader)") {
    val w = Seq(3L, -2L, 5L)
    val f = Seq((1L, Array(0.25f, -0.5f, 1.0f))).toDF("vec_id", "embedding")
    val d = Seq((1L, Array(0.25, -0.5, 1.0))).toDF("vec_id", "embedding")
    val sf = QualityModel.embeddingProbeScore(f, w).select("score_fx").as[Long].head()
    val sd = QualityModel.embeddingProbeScore(d, w).select("score_fx").as[Long].head()
    assert(sf == sd && sf == 3L * 256 - 2L * -512 + 5L * 1024)
  }

  test("rocAuc: hand-computed Mann-Whitney, ties at half credit, NULLs surfaced") {
    // pos scores {3, 2}, neg {1, 2}: wins (3>1, 3>2, 2>1) = 3, one tie
    // -> AUC = (2*3 + 1) / (2*2*2) = 7/8
    val scored = Seq(
      (Some(3L), Some(true)), (Some(2L), Some(true)),
      (Some(1L), Some(false)), (Some(2L), Some(false)),
      (None, Some(true)), (Some(9L), None)) // excluded, surfaced
      .toDF("score_ppm", "label")
    val r = QualityModel.rocAuc(scored).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 2L, 2L, 3L, 1L, 875000L)))
  }

  test("rocAuc: perfect / inverted / degenerate / empty inputs") {
    val perfect = Seq((10L, true), (9L, true), (1L, false))
      .toDF("score_ppm", "label")
    assert(QualityModel.rocAuc(perfect).head().getLong(5) == 1000000L)
    val inverted = Seq((1L, true), (10L, false)).toDF("score_ppm", "label")
    assert(QualityModel.rocAuc(inverted).head().getLong(5) == 0L)
    val onlyPos = Seq((1L, true), (2L, true)).toDF("score_ppm", "label")
    val d = QualityModel.rocAuc(onlyPos).head()
    assert(d.getLong(0) == 2L && d.getLong(1) == 0L && d.isNullAt(5),
      "no negatives: AUC must read NULL, not a fabricated half")
    val empty = Seq.empty[(Long, Boolean)].toDF("score_ppm", "label")
    val e = QualityModel.rocAuc(empty).head()
    assert(e.getLong(0) == 0L && e.getLong(2) == 0L && e.isNullAt(5))
  }
}
