package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00")),
    (2L, ts("2024-01-01 10:30:00")),
    (3L, ts("2024-01-01 11:59:59")),
    (4L, ts("2024-01-01 12:00:00")),
    (5L, ts("2024-01-02 09:00:00"))
  ).toDF("event_id", "ts")

  private val intervals = Seq(
    (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    (200L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00")),
    (300L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))
  ).toDF("iv_id", "iv_start", "iv_end")

  private def rangeJoin() = events.join(intervals,
    col("ts") >= col("iv_start") && col("ts") < col("iv_end"))

  test("rule rewrites a natural range join: same rows, no BNLJ/cartesian") {
    // without the rule: the natural formulation IS a nested-loop join
    val before = rangeJoin().queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      s"expected a pair-enumerating join without the rule:\n$before")
    val expected = rangeJoin().select("event_id", "iv_id")
      .as[(Long, Long)].collect().toSet

    RangeJoinRewrite.install(spark)
    try {
      val df = rangeJoin()
      val got = df.select("event_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got == expected)
      assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 200L)))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ survived:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian survived:\n$plan")
      // schema unchanged by the rewrite
      assert(df.columns.toSeq == rangeJoin().columns.toSeq)
    } finally RangeJoinRewrite.uninstall(spark)
  }

  test("rule leaves non-matching joins alone (equi, outer, wrong shape)") {
    RangeJoinRewrite.install(spark)
    try {
      // equi-join: untouched, still matches
      val equi = events.join(intervals, col("event_id") === col("iv_id"), "inner")
      assert(equi.count() == 0)
      // range condition but LEFT join: not eligible, still correct (BNLJ ok)
      val outer = events.join(intervals,
        col("ts") >= col("iv_start") && col("ts") < col("iv_end"), "left")
      assert(outer.count() == 6) // 4 match rows + events 4,5 null-extended
      // one-sided predicate only: not the full pattern
      val half = events.join(intervals, col("ts") >= col("iv_start"))
      assert(half.count() > 0)
    } finally RangeJoinRewrite.uninstall(spark)
  }

  test("closed interval (<=) also rewritten; boundary row now included") {
    RangeJoinRewrite.install(spark)
    try {
      val df = events.join(intervals,
        col("ts") >= col("iv_start") && col("ts") <= col("iv_end"))
      val got = df.select("event_id", "iv_id").as[(Long, Long)].collect().toSet
      // event 4 sits exactly on interval 100's end: included under <=
      assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (2L, 200L)))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    } finally RangeJoinRewrite.uninstall(spark)
  }
}
