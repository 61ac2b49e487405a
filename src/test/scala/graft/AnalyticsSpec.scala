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

  test("timingRegularity: hand-computed MAD; timer user flags, bursty doesn't") {
    def ev(u: Long, id: Long, s: Long) =
      (u, id, new Timestamp(1700000000000L + s * 1000L))
    // user 1: perfect 60 s timer, 11 events -> gaps all 60, mad 0
    val bot = (0L until 11L).map(i => ev(1L, i, i * 60L))
    // user 2: bursty gaps 10,10,10,600 repeated (12 events, 11 gaps)
    val bursts = Seq(0L, 10, 20, 30, 630, 640, 650, 660, 1260, 1270, 1280, 1290)
    val organic = bursts.zipWithIndex.map { case (s, i) => ev(2L, 100L + i, s) }
    // user 3: regular but too few events (3) -> not flagged
    val few = (0L until 3L).map(i => ev(3L, 200L + i, i * 60L))
    val df = (bot ++ organic ++ few).toDF("user_id", "event_id", "ts")
    val got = Analytics.timingRegularity(df, minEvents = 10L,
      botMadPpm = 100000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((10L, 60L, 0L, true)))
    // user 2: gaps = 9x10 + 2x600 -> sum 1290, mean 1290 div 11 = 117;
    // adev = 9*107 + 2*483 = 1929;
    // ppm = 1929*1e6 div (11*117) = 1929000000 div 1287 = 1498834
    assert(got(2L) == ((11L, 117L, 1498834L, false)))
    assert(got(3L) == ((2L, 60L, 0L, false))) // regular but under minEvents
  }

  test("timingRegularity: sub-second dispersion is not rounded to bot") {
    def ev(u: Long, id: Long, ms: Long) =
      (u, id, new Timestamp(1700000000000L + ms))
    // 12 events, gaps 2,2,4 repeating (mean 2 s, adev 6): flooring the
    // MAD to whole seconds FIRST gives 6 div 11 = 0 -> 0 ppm -> bot
    // despite 27% dispersion; the single-division form must score
    // (6*1e6) div (11*2) = 272727 ppm, organic.
    val gaps = Seq(0L, 2, 4, 8, 10, 12, 16, 18, 20, 24, 26, 28)
    val rows = gaps.zipWithIndex.map { case (s, i) => ev(9L, i, s * 1000L) }
    val got = Analytics.timingRegularity(rows.toDF("user_id", "event_id", "ts"),
      minEvents = 10L, botMadPpm = 100000L).head()
    // gaps: 2,2,4,2,2,4,2,2,4,2,2 -> sum 28, mean 28 div 11 = 2,
    // adev = 8*0 + 3*2 = 6, ppm = 6e6 div 22 = 272727
    assert(got.getLong(1) == 11L && got.getLong(2) == 2L)
    assert(got.getLong(3) == 272727L && !got.getBoolean(4))
  }
}
