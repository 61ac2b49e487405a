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
}
