package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Relational

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalJoin == naive theta join; planned as equi-join, not BNLJ") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 11:59:59")),
      (4L, ts("2024-01-01 12:00:00")), // exactly at an end -> excluded (half-open)
      (5L, ts("2024-01-02 09:00:00"))
    ).toDF("event_id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (200L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00")),
      (300L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00")) // no hits
    ).toDF("iv_id", "iv_start", "iv_end")

    val got = Relational.intervalJoin(events, intervals, "ts", "iv_start", "iv_end")
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    // interval 100 catches events 1,2,3 (4 is at the exclusive end);
    // interval 200 catches event 2 only; interval 300 nothing
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 200L)))

    // identical result from the naive cross+filter form
    val naive = events.crossJoin(intervals)
      .where(col("ts") >= col("iv_start") && col("ts") < col("iv_end"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == naive)

    // the point of the operator: the physical plan is an equi-join on the
    // bucket, never a nested-loop over the pair space
    val plan = Relational.intervalJoin(events, intervals, "ts", "iv_start", "iv_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("intervalJoin: interval spanning many buckets still matches once per pair") {
    val events = Seq((1L, ts("2024-01-01 23:30:00"))).toDF("event_id", "ts")
    // 48-hour interval -> explodes into ~49 hourly buckets
    val intervals = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("iv_id", "iv_start", "iv_end")
    val got = Relational.intervalJoin(events, intervals, "ts", "iv_start", "iv_end")
    assert(got.count() == 1, "one (event, interval) pair -> exactly one row")
  }
}
