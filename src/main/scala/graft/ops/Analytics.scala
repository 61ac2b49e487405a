package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the engagement event stream — the queries the
  * reference's warehouse tables exist to answer (its ClickHouse side holds
  * enriched engagement events precisely so product analysts can ask
  * "where do users drop off" and "do cohorts come back"). Both operators
  * are pure equi-keyed aggregations/joins over integer-exact derivations,
  * so they hash-match DuckDB and scale like any keyed agg.
  */
object Analytics {

  /** Ordered funnel: per stage k, the users whose first stage-k event
    * happens strictly AFTER their first qualifying stage-(k-1) event —
    * the classic windowed-funnel semantics (an early purchase before the
    * view does NOT count). Output: one row per stage with the surviving
    * user count.
    *
    * Shape: the source is scanned ONCE — a single `event_type IN stages`
    * filter (pushed to the scan) materializes the funnel-relevant slice
    * via eager localCheckpoint, and every stage reads that slice. Each
    * stage then joins against the previous stage's survivor set — at
    * most #users rows, broadcast. No global window, no per-user
    * event-list materialization. */
  def funnel(events: DataFrame, stages: Seq[String], userCol: String = "user_id",
             tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events
      .where(col(typeCol).isInCollection(stages))
      .select(col(userCol).as("u"), col(tsCol).as("t"), col(typeCol).as("et"))
      .transform(graft.plans.CheckpointAudit.local)
    var reached: DataFrame = null
    val counts = stages.zipWithIndex.map { case (s, i) =>
      reached =
        if (i == 0)
          e.where(col("et") === s).groupBy(col("u")).agg(min(col("t")).as("t"))
        else
          e.where(col("et") === s)
            .join(broadcast(reached.select(col("u"), col("t").as("_tp"))), Seq("u"))
            .where(col("t") > col("_tp"))
            .groupBy(col("u")).agg(min(col("t")).as("t"))
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(s).as("event_type"), col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  /** Weekly cohort retention: cohort = a user's first active week (integer
    * weeks since `anchor` — pure integer date arithmetic, no calendar/
    * timezone semantics to diverge between engines), k = weeks since
    * cohort; emits how many of each cohort's users were active in week
    * cohort+k. Two aggregations over a deduplicated (user, week) frame —
    * the frame is bounded by users × weeks regardless of event volume. */
  def retention(events: DataFrame, anchor: String = "2024-01-01",
                userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val widx = floor(datediff(col(tsCol).cast("date"), lit(anchor).cast("date")) / 7)
      .cast("long")
    val active = events.select(col(userCol).as("u"), widx.as("widx")).distinct()
    val first = active.groupBy(col("u")).agg(min(col("widx")).as("cohort"))
    active.join(first, Seq("u"))
      .groupBy(col("cohort"), (col("widx") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("n_users"))
  }
}
