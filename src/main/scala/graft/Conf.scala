package graft

import org.apache.spark.sql.SparkSession

/** Session configuration shared by every graft entry point.
  *
  * The reference runs Spark 3.5 where `spark.sql.ansi.enabled` defaults to
  * false (invalid casts yield NULL — reference pipeline/app.py:46-51 relies
  * on this for malformed CDC envelopes). This repo builds against Spark
  * 4.1.2 where ANSI defaults to true, so we pin the legacy semantics at
  * runtime. All of these are runtime-settable confs, so applying them to a
  * session the driver created is safe.
  */
object Conf {
  def ensure(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // Reference semantics: invalid cast -> NULL, not exception (app.py:46-51).
    c.set("spark.sql.ansi.enabled", "false")
    // Runtime re-planning: coalesce tiny shuffle partitions, handle skew.
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Deterministic timestamps for oracle comparison.
    c.set("spark.sql.session.timeZone", "UTC")
    // testdata events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 cannot
    // map to TimestampType ([PARQUET_TYPE_ILLEGAL]); read it as Long nanos
    // and convert explicitly (model.Tables.events).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // graft_* SQL functions (expr.Functions) — idempotent re-registration.
    graft.expr.Functions.register(spark)
    spark
  }
}
