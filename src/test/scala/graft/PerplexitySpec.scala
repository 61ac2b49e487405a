package graft

import graft.ops.Perplexity

/** CCNet-style LM filter on a planted domain shift: docs drawn from the
  * target's phrase distribution must land in head, gibberish in tail,
  * and the integer surprisal/log2 discipline must be closed-form
  * checkable on a tiny hand-computable model.
  */
class PerplexitySpec extends SparkTestBase {
  import spark.implicits._

  test("planted domain shift: target-like docs head, gibberish tail") {
    // target: 30 docs of a repetitive in-domain phrase world
    val target = (1 to 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again")).toDF("doc_id", "text")
    // corpus: 6 in-domain, 6 half-domain, 6 gibberish (distinct token shapes
    // -> distinct hashed buckets with overwhelming probability at 4096)
    val corpus = (
      (1 to 6).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      (7 to 12).map(i => (i.toLong, "the quick brown fox visits zx" + i + " qq" + i + " ww" + i)) ++
      (13 to 18).map(i => (i.toLong, s"zzz$i yyy$i xxx$i www$i vvv$i uuu$i ttt$i sss$i rrr$i"))
    ).toDF("doc_id", "text")
    val got = Perplexity.perplexityBuckets(corpus, target)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    (1 to 6).foreach(i => assert(got(i.toLong) == "head", s"doc $i: ${got(i.toLong)}"))
    (13 to 18).foreach(i => assert(got(i.toLong) == "tail", s"doc $i: ${got(i.toLong)}"))
    // middle tier exists and is the half-domain band
    assert((7 to 12).count(i => got(i.toLong) == "middle") >= 4)
  }

  test("integer discipline: surprisal ratio and exact log2 on a 2-doc model") {
    // target = one doc "a a a": tokens hash to one value v; unigrams:
    // bucket(v) count 3; bigrams: one bucket count 2. Corpus doc "a a":
    // one bigram, same buckets -> r = (10000 * (3 + 4096)) DIV (2 + 1)
    val target = Seq((1L, "a a a")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a a")).toDF("doc_id", "text")
    val row = Perplexity.lmScore(corpus, target)
      .select("n_bigrams", "surprisal_sum", "log2_sum", "avg_surprisal")
      .as[(Long, Long, Long, Long)].collect().head
    val expectedR = (10000L * (3L + 4096L)) / 3L
    assert(row == ((1L, expectedR, 63 - java.lang.Long.numberOfLeadingZeros(expectedR), expectedR)))
  }

  test("unseen bigrams score the max-smoothing ratio") {
    val target = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val corpus = Seq((1L, "unseen1 unseen2")).toDF("doc_id", "text")
    val row = Perplexity.lmScore(corpus, target)
      .select("surprisal_sum").as[Long].collect().head
    // context bucket unseen (cu=0), bigram unseen (cb=0):
    // r = (10000 * 4096) DIV 1 — unless the unseen context collides with
    // one of the 4 target unigram buckets (cu>0 lifts the score): either
    // way the score is >= the no-collision floor
    assert(row >= 10000L * 4096L)
  }

  test("sub-2-token docs are dropped (no bigram evidence)") {
    val target = Seq((1L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = Perplexity.perplexityBuckets(corpus, target)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("persisted LM: score-from-index equals score-from-training") {
    val target = (1 to 20).map(i =>
      (i.toLong, "alpha beta gamma delta " + (i % 3))).toDF("doc_id", "text")
    val corpus = (1 to 15).map(i =>
      (i.toLong, "alpha beta x" + i + " gamma delta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toFile
    dir.deleteOnExit()
    graft.ops.Perplexity.saveLm(target, dir.getAbsolutePath)
    val direct = graft.ops.Perplexity.lmScore(corpus, target)
      .orderBy("doc_id").collect().map(_.toString)
    val loaded = graft.ops.Perplexity.lmScoreFromIndex(corpus, dir.getAbsolutePath)
      .orderBy("doc_id").collect().map(_.toString)
    assert(loaded.sameElements(direct))
  }

  test("cumulativeByValue == direct global window on NON-collapsing means") {
    // the round-8 watch-item's adversarial shape: every value distinct,
    // so the old Window.orderBy form would sort all of them in one task.
    // The bounded two-level form must be row-identical.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dist = (1 to 500).map(i => (i * 7L % 501L, (i % 5 + 1).toLong))
      .toDF("v", "c") // distinct values, shuffled insert order
    val got = Perplexity.cumulativeByValue(dist, "v", "c", parts = 7)
      .select(col("v"), col("_cum")).as[(Long, Long)].collect().sortBy(_._1)
    val exp = dist.withColumn("_cum",
        sum(col("c")).over(Window.orderBy(col("v"))))
      .select(col("v"), col("_cum")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.sameElements(exp))
    // degenerate partitionings too: everything in one range partition,
    // and more partitions than rows
    for (p <- Seq(1, 1000)) {
      val g = Perplexity.cumulativeByValue(dist, "v", "c", parts = p)
        .select(col("v"), col("_cum")).as[(Long, Long)].collect().sortBy(_._1)
      assert(g.sameElements(exp), s"parts=$p diverged")
    }
  }

  test("tiers stable when every doc has a distinct mean (spread scores)") {
    val target = Seq((1L, "t t t t t t")).toDF("doc_id", "text")
    // each doc gets a unique token mix -> avg_surprisal values spread out
    val corpus = (1 to 30).map { i =>
      (i.toLong, ("t " * (31 - i)) + (1 to i).map(j => s"u${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Perplexity.perplexityBuckets(corpus, target)
      .select("doc_id", "avg_surprisal", "ppl_bucket")
      .as[(Long, Long, String)].collect()
    assert(rows.length == 30)
    assert(rows.map(_._2).distinct.length >= 25, "fixture must actually spread the means")
    // value-threshold tertiles: sorted by mean, buckets are contiguous
    // head..middle..tail with roughly n/3 each
    val sorted = rows.sortBy(_._2).map(_._3)
    assert(sorted.takeWhile(_ == "head").length >= 9)
    assert(sorted.reverse.takeWhile(_ == "tail").length >= 9)
    val idx = sorted.zipWithIndex
    def span(b: String) = { val xs = idx.filter(_._1 == b).map(_._2); (xs.min, xs.max) }
    val (h, m, t) = (span("head"), span("middle"), span("tail"))
    assert(h._2 < m._1 && m._2 < t._1, s"tiers must be contiguous in mean order: $h $m $t")
  }

  test("tertile thresholds cover the whole corpus and are value-based") {
    val target = Seq((1L, "t t t t t t")).toDF("doc_id", "text")
    // 9 docs with 3 distinct score levels (3 docs each)
    val corpus = (
      (1 to 3).map(i => (i.toLong, "t t t")) ++
      (4 to 6).map(i => (i.toLong, "t m" + i)) ++
      (7 to 9).map(i => (i.toLong, "g" + i + "a g" + i + "b"))
    ).toDF("doc_id", "text")
    val got = Perplexity.perplexityBuckets(corpus, target)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(got.size == 9)
    assert((1 to 3).forall(i => got(i.toLong) == "head"))
    // all docs sharing one score value share one bucket (value thresholds)
    assert((4 to 6).map(i => got(i.toLong)).toSet.size <= 2)
  }
}
