package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityModel

class LogregSpec extends SparkTestBase {
  import spark.implicits._

  // synthetic separable corpus: long texts carry " the " (y=1), short
  // ones don't (y=0) — length bucket x1 and the label are perfectly
  // correlated, so 8 GD rounds must learn a separating weight
  private def sepDocs = {
    val pos = (1L to 40L).map(i => (i, ("word " * 200) + " the " + ("tail " * 10)))
    val neg = (41L to 80L).map(i => (i, "short text " + i))
    (pos ++ neg).toDF("doc_id", "text")
  }

  test("logregFrame: one row per distinct feature vector, counts add up") {
    val f = QualityModel.logregFrame(sepDocs).collect()
    assert(f.map(_.getLong(3)).sum == 80L)
    assert(f.map(_.getLong(4)).sum == 40L)
    // quantized grid: every feature in 0..15
    f.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 0L && r.getLong(i) <= 15L))
    }
  }

  test("logregTrain learns a separator on a separable set; deterministic") {
    val w = QualityModel.logregTrain(QualityModel.logregFrame(sepDocs))
    val scored = QualityModel.logregScore(sepDocs, w)
    // every prediction must match the label after 8 rounds
    val wrong = scored.where(col("pred") =!= (col("y") === 1L)).count()
    assert(wrong == 0L, s"$wrong misclassified on a separable set")
    // probabilities actually separate (not all clamped to one side)
    val (pmin, pmax) = scored.agg(min("p_ppm"), max("p_ppm"))
      .as[(Long, Long)].head()
    assert(pmin < 500000L && pmax > 500000L, s"p range [$pmin,$pmax]")
    // exact determinism: retraining yields identical weights
    val w1 = w.as[(Long, Long, Long, Long)].head()
    val w2 = QualityModel.logregTrain(QualityModel.logregFrame(sepDocs))
      .as[(Long, Long, Long, Long)].head()
    assert(w1 == w2)
  }

  test("hard-sigmoid clamp is reached but never exceeded on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = QualityModel.logregScore(docs,
      QualityModel.logregTrain(QualityModel.logregFrame(docs)))
    val (pmin, pmax, n) = scored
      .agg(min("p_ppm"), max("p_ppm"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(n == docs.count())
    assert(pmin >= 0L && pmax <= 1000000L)
  }
}
