package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the attribution
  * shape: every click joined to the impression that preceded it within an
  * attribution window, both sides unbounded streams.
  *
  * Spark's stream-stream equi-join keeps both sides' rows in state until
  * the watermark proves no future match can arrive; the TIME-RANGE
  * predicate (click within [impression_ts, impression_ts + window]) is
  * what lets it evict: impression state older than
  * watermark - window and click state older than watermark are dropped.
  * Without the range condition the state would grow forever — the
  * difference between a demo and something that survives a week of
  * production traffic. (Reference has no stream-stream joins; this is
  * part of the §2.8 "engine completeness" surface.)
  */
object StreamJoin {

  /** Inner attribution join: (user_id, click_id, impression_id, lag_s).
    * Both inputs need (user_id, <idCol>, <tsCol>). */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      windowMinutes: Int = 10,
                      watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .withWatermark("ts", watermark)
      .select(col("user_id").as("i_user"), col("event_id").as("impression_id"),
        col("ts").as("i_ts"))
    val clk = clicks
      .withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    clk.join(imp,
      col("c_user") === col("i_user") &&
        col("c_ts") >= col("i_ts") &&
        col("c_ts") <= col("i_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("impression_id"),
        ((unix_micros(col("c_ts")) - unix_micros(col("i_ts"))) / 1000000.0).as("lag_s"))
  }
}
