package graft

import graft.ops.{Stats, Variants}

class VariantsStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("propsSummary: typed variant extraction, missing/malformed keys -> null") {
    val ev = Seq(
      (1L, "a", """{"k": 10}"""),
      (2L, "a", """{"k": 32}"""),
      (3L, "a", """{"other": 5}"""), // no k -> null (counted in n, not n_k)
      (4L, "b", """{"k": 7}""")
    ).toDF("event_id", "event_type", "props")
    val got = Variants.propsSummary(ev)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (t, n, nk, s, mn, mx) => t -> ((n, nk, s, mn, mx)) }.toMap
    assert(got("a") == ((3L, 2L, 42L, 10L, 32L)))
    assert(got("b") == ((1L, 1L, 7L, 7L, 7L)))
  }

  test("exactQuantiles: distributed selection equals the built-in percentile aggregate") {
    import org.apache.spark.sql.functions._
    // skewed + duplicated values across many partitions, incl. a null
    val vals = (1 to 997).map(i => (i * i % 401).toDouble) ++ Seq(7.0, 7.0, 7.0)
    val df = vals.map(Option(_)).:+(None: Option[Double])
      .toDF("x").repartition(13)
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.0, 1.0)
    val got = Stats.exactQuantiles(df, "x", ps, parts = 7)
    val want = df.agg(percentile(col("x"), array(ps.map(lit(_)): _*)))
      .head().getSeq[Double](0)
    // same R-7 definition; interpolation may differ in the last ulp only
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-12 * math.max(math.abs(w), 1.0),
        s"quantile mismatch: got $g want $w")
    }
    assert(Stats.exactQuantiles(Seq.empty[Double].toDF("x"), "x", Seq(0.5))
      .forall(_.isNaN), "empty input yields NaN")
  }

  test("equiDepthHistogram: depths within one boundary-tie of n/buckets, lo<=hi, full coverage") {
    val df = (1 to 2000).map(i => ((i * 37) % 1999).toDouble / 3.0).toDF("x")
    val h = Stats.equiDepthHistogram(df, "x", buckets = 10, parts = 5)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq == (0L until 10L), "every bucket populated")
    assert(h.map(_._2).sum == 2000L, "depths cover every row")
    h.foreach { case (b, cnt, lo, hi) =>
      assert(lo <= hi, s"bucket $b has lo > hi")
      assert(math.abs(cnt - 200L) <= 4, s"bucket $b depth $cnt far from 200")
    }
  }

  test("numericColumnStats: one row per column, nulls counted, min/max exact") {
    val df = Seq(
      (Some(1.5), Some(10L)),
      (None, Some(20L)),
      (Some(-2.5), None)
    ).toDF("x", "y")
    val got = Stats.numericColumnStats(df, Seq("x", "y"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("x") == ((2L, 1L, -2.5, 1.5)))
    assert(got("y") == ((2L, 1L, 10.0, 20.0)))
  }

  test("rankAgreement: hand-computed gamma, ties abstain, sign and NULL cases") {
    // hist cells (0,0):2, (1,1):1, (2,0):1 -> C = 2, D = 1,
    // the (0,0)-(2,0) pair ties on y and abstains
    val df = Seq((0L, 0L), (0L, 0L), (1L, 1L), (2L, 0L)).toDF("x", "y")
    val r = Stats.rankAgreement(df).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 1L, 333333L)))
    // fully inverted: gamma must be exactly -1e6 (sign-factored division)
    val inv = Stats.rankAgreement(Seq((0L, 1L), (1L, 0L)).toDF("x", "y")).head()
    assert(inv.getLong(3) == -1000000L)
    // every pair tied on one axis: no votes -> NULL, never 0
    val tied = Stats.rankAgreement(Seq((0L, 0L), (1L, 0L)).toDF("x", "y")).head()
    assert(tied.getLong(0) == 2L && tied.isNullAt(3))
  }

  test("rocAucBy: per-group fold, one-class group reads NULL, NULL group surfaces") {
    val df = Seq(
      (Some("A"), Some(10L), true), (Some("A"), Some(5L), false),  // perfect
      (Some("B"), Some(1L), true), (Some("B"), Some(2L), true),    // one-class
      (None, Some(3L), true), (None, Some(1L), false))             // NULL group
      .map { case (g, s, y) => (g.orNull, s.get, y) }
      .toDF("source", "score_ppm", "label")
    val got = graft.ops.QualityModel.rocAucBy(df, "source").collect()
      .map(r => Option(r.getString(0)).getOrElse("_null") ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got("A") == ((1L, 1L, Some(1000000L))))
    assert(got("B") == ((2L, 0L, None)),
      "a one-class group must read NULL auc with counts intact")
    assert(got("_null") == ((1L, 1L, Some(1000000L))),
      "a NULL group value forms its own surfaced row")
  }
}
