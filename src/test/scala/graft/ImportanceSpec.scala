package graft

import org.apache.spark.sql.functions._
import graft.ops.Importance

class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramBuckets: count, range, and short-doc edge cases") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // 3 bigrams
      (2L, "solo"),                   // 1 token -> no bigrams
      (3L, "  \t "),                  // whitespace-only -> no bigrams
      (4L, "")                        // empty -> no bigrams
    ).toDF("doc_id", "text")
    val b = docs.select(col("doc_id"),
      Importance.bigramBuckets(col("text"), 4096).as("bks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(b(1L).size == 3)
    assert(b(2L).isEmpty && b(3L).isEmpty && b(4L).isEmpty)
    assert(b(1L).forall(x => x >= 0 && x < 4096))
    // repeated bigram hashes identically wherever it occurs
    val rep = Seq((1L, "x y z x y")).toDF("doc_id", "text")
      .select(Importance.bigramBuckets(col("text"), 4096).as("bks"))
      .as[Seq[Long]].head()
    assert(rep.head == rep(3), "same bigram must land in the same bucket")
  }

  test("dsirWeights: target==raw is exactly neutral; enrichment raises w") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "lorem ipsum dolor sit")
    ).toDF("doc_id", "text")
    // ct == cr per bucket -> w = (scale*(c+1)) div (c+1) = scale exactly
    val neutral = Importance.dsirWeights(docs, docs)
    assert(neutral.where(col("w") =!= 10000L).isEmpty)
    assert(neutral.count() <= 4096)
    // a target of only doc 3: its buckets stay neutral (cr=1, ct=1 ->
    // ratio 1) while the fox buckets (cr=2, ct=0 -> (10000*1) div 3)
    // fall below — the ratio discriminates by RELATIVE frequency
    val w = Importance.dsirWeights(docs, docs.where(col("doc_id") === 3))
    val loremBuckets = docs.where(col("doc_id") === 3).select(
      explode(Importance.bigramBuckets(col("text"), 4096)).as("bucket"))
    assert(w.join(loremBuckets, Seq("bucket"))
      .where(col("w") =!= 10000L).isEmpty, "target-only buckets must stay neutral")
    assert(w.join(loremBuckets, Seq("bucket"), "left_anti")
      .where(col("w") >= 10000L).isEmpty, "raw-only buckets must fall below neutral")
  }

  test("dsirResample: planted domain shift selects target-like docs, deterministically") {
    // 40 "code-like" docs (distinct bigram families per doc via the i
    // suffix on half the tokens) and 40 "prose-like" docs; the target is
    // a small prose sample -> the resampled top-20 must be all prose
    val code = (0 until 40).map(i => (i.toLong, s"def f$i ( x$i ) : return x$i + f$i"))
    val prose = (0 until 40).map(i => ((100 + i).toLong, s"the old river town t$i kept its quiet charm t$i"))
    val corpus = (code ++ prose).toDF("doc_id", "text")
    val target = prose.take(5).map { case (id, t) => (id + 1000L, t) }.toDF("doc_id", "text")
    val top = Importance.dsirResample(corpus, target, k = 20)
    assert(top.count() == 20)
    assert(top.where(col("doc_id") < 100).isEmpty, "selected a code doc over prose")
    // deterministic under repartition: identical row set
    val top2 = Importance.dsirResample(corpus.repartition(7), target, k = 20)
    assert(top.except(top2).isEmpty && top2.except(top).isEmpty)
    // scores are integer-exact: avg_w == score div n_bigrams
    assert(top.where(col("avg_w") =!= expr("score DIV n_bigrams")).isEmpty)
  }

  test("dsirScore: docs under two tokens carry no evidence and drop") {
    val corpus = Seq((1L, "a b c"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val w = Importance.dsirWeights(corpus, corpus)
    val s = Importance.dsirScore(corpus, w)
    assert(s.select("doc_id").as[Long].collect().toSet == Set(1L))
  }
}
