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

  /** Automation / bot-traffic detection by inter-arrival REGULARITY —
    * the behavioral-curation gate the content filters can't express:
    * scripted actors fire on timers, so their event-gap dispersion
    * collapses, while organic users' gaps are bursty (MAD/mean near an
    * exponential's ~0.7). A training pipeline over engagement data drops
    * or downweights bot actors before modeling (the q115/q138 idea
    * applied to WHO, not WHAT).
    *
    * Exact integer discipline: gaps in whole seconds
    * (`unix_micros div 1e6` — truncation both engines share), the mean
    * via integer div, mean-absolute-deviation via a second bounded agg
    * over |gap − mean|, and the dispersion as
    * `mad_ppm = (mad_s·1e6) div max(mean_s, 1)` — every intermediate a
    * BIGINT DuckDB replays. No float variance whose summation order
    * could differ cross-engine, and MAD needs no overflow-prone squares
    * (seconds² · count would pass 2^63 on year-long spans).
    *
    * Shape at scale: one lag window partitioned by user (bounded by
    * per-user event count, the q35 sessionization discipline), two
    * keyed aggs, one equi-join on user — no global window, no
    * collect. */
  def timingRegularity(events: DataFrame, minEvents: Long = 10L,
                       botMadPpm: Long = 100000L,
                       userCol: String = "user_id",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    val gaps = events
      .withColumn("_gap_s",
        expr(s"(unix_micros($tsCol) - lag(unix_micros($tsCol)) over " +
          s"(partition by $userCol order by $tsCol, $tieCol)) div 1000000"))
      .where(col("_gap_s").isNotNull)
      .select(col(userCol), col("_gap_s"))
    val means = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_gap_s")).as("_sum_s"))
      .withColumn("mean_gap_s", expr("_sum_s div n_gaps"))
      .drop("_sum_s")
    // single division at the end — flooring the MAD to whole seconds
    // FIRST would zero out any sub-second dispersion and flag fast
    // organic users as bots; _adev·1e6 stays in BIGINT range (Σ|gap −
    // mean| ≤ 2·span ≤ ~6e9 s even on century spans)
    gaps.join(means, Seq(userCol))
      .groupBy(col(userCol), col("n_gaps"), col("mean_gap_s"))
      .agg(sum(abs(col("_gap_s") - col("mean_gap_s"))).as("_adev"))
      .withColumn("mad_ppm",
        expr("(_adev * 1000000) div (n_gaps * greatest(mean_gap_s, 1L))"))
      .withColumn("bot_like",
        col("n_gaps") >= (minEvents - 1L) && col("mad_ppm") <= botMadPpm)
      .drop("_adev")
  }
}
