package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: split each user's event stream into sessions separated
  * by inactivity gaps > `gapMinutes`.
  *
  * Batch form (here): the classic lag/cumsum window formulation —
  * session boundary where ts - lag(ts) > gap, session index = running sum
  * of boundaries, then one aggregate per (user, session). Two shuffles
  * (window partition + final group), both keyed on user_id so at scale
  * they reuse one hash partitioning (Exchange reuse); fully
  * SQL-expressible, so this one is DuckDB-oracle-checked.
  *
  * Streaming form: graft.streaming.Sessionize uses
  * flatMapGroupsWithState + event-time timeout — same output, incremental
  * state; StreamingSpec asserts stream == batch.
  *
  * Timestamps compare in microseconds (unix_micros) — the exact precision
  * Spark carries; the oracle truncates its nanosecond source the same way
  * (FIXTURES.md gotcha).
  */
object Sessionize {

  /** The BUILT-IN session-window form of [[sessions]]: one
    * `groupBy(key, session_window(ts, gap))` aggregation — Spark merges
    * overlapping per-row [ts, ts+gap) windows into sessions inside a
    * single aggregate (no window-function pass, no lag/cumsum). Same
    * session boundaries as the manual form; the window END differs by
    * definition (last_event + gap, not last_event), which is why both
    * forms exist: this one is the engine-native operator a user should
    * reach for first, the lag/cumsum one yields the exact row-level
    * session_idx the reference-style audit queries want. */
  def sessionWindows(events: DataFrame, keyCol: String = "user_id",
                     tsCol: String = "ts", gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  def sessions(events: DataFrame, keyCol: String = "user_id", tsCol: String = "ts",
               gapMinutes: Int = 30, tieBreakCol: String = "event_id"): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val us = unix_micros(col(tsCol))
    // tieBreakCol makes same-microsecond events order deterministically;
    // callers whose schema lacks event_id pass their own unique column
    val w = Window.partitionBy(col(keyCol)).orderBy(us, col(tieBreakCol))
    val boundary = when(us - lag(us, 1).over(w) > gapUs, 1).otherwise(0)
    events
      .withColumn("_b", boundary)
      .withColumn("session_idx", sum(col("_b")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_s",
        (unix_micros(col("session_end")) - unix_micros(col("session_start"))) / lit(1000000.0))
  }
}
