package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Curate}

class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering enforced — early purchase does not count") {
    val events = Seq(
      // u1 completes the full funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2 purchases BEFORE viewing -> stops at stage 2
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "click"),
      // u3 views only
      (3L, ts("2024-01-01 11:00:00"), "view"),
      // u4 clicks without viewing -> never enters
      (4L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)), got.toString)
  }

  test("funnel: click at exactly the view timestamp is NOT after it") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.funnel(events, Seq("view", "click"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    assert(got == List((1L, "view", 1L), (2L, "click", 0L)))
  }

  test("retention: hand-built cohorts") {
    val events = Seq(
      // u1: first week 0, returns week 1 and 3
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-09 10:00:00"), "view"),
      (1L, ts("2024-01-23 10:00:00"), "view"),
      // u2: first week 0 only
      (2L, ts("2024-01-03 10:00:00"), "view"),
      // u3: first week 1, returns week 2
      (3L, ts("2024-01-10 10:00:00"), "view"),
      (3L, ts("2024-01-17 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Analytics.retention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)), got.toString)
  }

  test("trainValTestSplit: disjoint, exhaustive, stable, ~80/10/10") {
    val df = spark.range(0, 10000).select($"id".as("doc_id"))
    val s = Curate.trainValTestSplit(df, "doc_id")
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L, "every row gets exactly one split")
    assert(counts("train") > 7700 && counts("train") < 8300, counts.toString)
    assert(counts("val") > 800 && counts("val") < 1200, counts.toString)
    assert(counts("test") > 800 && counts("test") < 1200, counts.toString)
    // stability: same ids land in the same split under repartitioning
    val s2 = Curate.trainValTestSplit(df.repartition(13), "doc_id")
    assert(s.except(s2).isEmpty && s2.except(s).isEmpty)
    // the val band nests inside train+val: raising trainFrac only moves
    // val/test rows into train, never reshuffles (monotone bands)
    val wider = Curate.trainValTestSplit(df, "doc_id", trainFrac = 0.85, valFrac = 0.05)
    val moved = s.where($"split" === "train")
      .join(wider.where($"split" =!= "train"), "doc_id")
    assert(moved.isEmpty, "train rows must stay train when the band widens")
  }
}
