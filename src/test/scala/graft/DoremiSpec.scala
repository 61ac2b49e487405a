package graft

import org.apache.spark.sql.functions._
import graft.ops.Importance

class DoremiSpec extends SparkTestBase {
  import spark.implicits._

  // two sources with engineered lexical diversity: "rich" docs are all
  // distinct words (ttr = 1e6), "poor" docs repeat one word (ttr -> 0)
  private def twoSources = {
    val rich = (1L to 20L).map(i =>
      (i, "rich", (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
    val poor = (21L to 40L).map(i => (i, "poor", "dup " * 30))
    (rich ++ poor).toDF("doc_id", "source", "text")
  }

  test("doremiWeights upweights the excess-loss source, never the other") {
    val w = Importance.doremiWeights(twoSources)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (rn, rloss, ralpha, ravg) = w("rich")
    val (pn, ploss, palpha, pavg) = w("poor")
    assert(rn == 20L && pn == 20L)
    assert(rloss == 1000000L, s"all-distinct words must read ttr 1e6, got $rloss")
    assert(ploss < 100000L, s"repeated word must read low ttr, got $ploss")
    // the high-loss (rich) source gains weight every round; the other loses
    assert(ralpha > 500000L && palpha < 500000L, s"alphas $ralpha/$palpha")
    assert(ravg > 500000L && pavg < 500000L)
    // final weight moved further than the round-average (monotone ascent)
    assert(ralpha >= ravg)
    // weights stay a (floor-rounded) distribution
    assert(ralpha + palpha <= 1000000L && ralpha + palpha > 999990L)
    assert(ravg + pavg <= 1000000L)
  }

  test("uniform losses are a fixed point: weights stay uniform") {
    val docs = (1L to 30L).map(i =>
      (i, s"s${i % 3}", (1 to 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val w = Importance.doremiWeights(docs)
    // every source has ttr exactly 1e6 -> zero excess everywhere -> the
    // multiplier is 1 for all, so alpha never moves off 1e6 div 3
    val alphas = w.select("alpha_ppm").as[Long].collect().toSet
    assert(alphas == Set(333333L), alphas.toString)
    assert(w.select("alpha_avg_ppm").as[Long].collect().toSet == Set(333333L))
  }

  test("real corpus: deterministic, bounded, one row per source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w1 = Importance.doremiWeights(docs).orderBy("source").collect()
    val w2 = Importance.doremiWeights(docs).orderBy("source").collect()
    assert(w1.toSeq == w2.toSeq)
    assert(w1.length == docs.select("source").distinct().count())
    val total = w1.map(_.getLong(3)).sum
    assert(total <= 1000000L && total > 900000L, s"alpha total $total")
  }
}
