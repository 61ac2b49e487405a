package graft

import org.apache.spark.sql.functions._
import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish corpus: token t_i appears ~1000/i times, i in 1..60 — more
  // distinct tokens than sketch capacity, skewed like real vocabularies
  private def corpus = {
    val words = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(words)
    shuffled.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  test("MG invariants: undercount bounded by N/(m+1), heavy items retained") {
    val m = 16
    val docs = corpus
    val n = docs.select(explode(graft.ops.TextAnalysis.tokens(col("text"))))
      .count()
    val exact = docs
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val sketch = HeavyHitters.tokenSketch(docs, m)
      .as[(String, Long)].collect().toMap
    assert(sketch.size <= m)
    val bound = n.toDouble / (m + 1)
    sketch.foreach { case (t, approx) =>
      val ex = exact(t)
      assert(approx <= ex, s"$t overcounted: $approx > $ex")
      assert(ex - approx <= bound, s"$t undercount ${ex - approx} > $bound")
    }
    // any token with exact > N/(m+1) must be present
    exact.collect { case (t, c) if c > bound => t }
      .foreach(t => assert(sketch.contains(t), s"heavy item $t evicted"))
  }

  test("sketch guarantees stable under repartitioning (mergeability)") {
    val m = 16
    for (parts <- Seq(1, 4, 13)) {
      val docs = corpus.repartition(parts)
      val got = HeavyHitters.certifiedTopTokens(docs, k = 10, m = m)
        .select("present_ok", "bound_ok").as[(Boolean, Boolean)].collect()
      assert(got.nonEmpty && got.forall(p => p._1 && p._2),
        s"invariant broken at $parts partitions")
    }
  }

  test("certifiedTopTokens: exact top-k with all-true certificates on testdata") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = HeavyHitters.certifiedTopTokens(docs, k = 5, m = 16).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }
}
