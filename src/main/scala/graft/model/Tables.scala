package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}
import graft.Conf

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column has
  * shipped in three physical shapes across testdata generations, so the
  * loader dispatches on the dtype it actually finds:
  *
  *  - parquet TIMESTAMP(NANOS): Spark 4 cannot represent nanosecond
  *    timestamps, so it arrives as Long nanos
  *    (spark.sql.legacy.parquet.nanosAsLong=true, Conf.scala) and we
  *    truncate to microseconds with integer division. `/` would go through
  *    Double and lose precision (ns epoch ~1.7e18 > 2^53), hence `div`.
  *  - parquet timestamp[us] without tz (isAdjustedToUTC=false): arrives as
  *    TIMESTAMP_NTZ; the session TZ is pinned to UTC (Conf.scala), so a
  *    cast to TimestampType maps wall-clock to the identical instant.
  *  - parquet timestamp[us/ms] with tz: arrives as TimestampType already —
  *    pass through.
  *
  * Schema-on-read with per-dtype normalization is the 100 TB-safe shape: a
  * fleet reading years of parquet will see every writer generation, and a
  * loader that assumes one physical type dies at analysis time on the rest
  * (exactly what happened when the testdata was regenerated in round 7).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Conf.ensure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` normalized to a proper microsecond TimestampType,
    * whatever physical type the parquet writer used (see object doc).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.withColumn("ts", normalizeTs(raw, "ts"))
  }

  /** Dtype-dispatched timestamp normalization (see object doc). */
  private[graft] def normalizeTs(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case LongType         => timestamp_micros(expr(s"$colName div 1000"))
      case TimestampNTZType => col(colName).cast(TimestampType)
      case TimestampType    => col(colName)
      // ISO-8601 strings are the remaining plausible writer shape (a
      // CSV-era or JSON-era regeneration); UTC session makes the parse
      // exact, and a malformed value fails the ANSI-off way (NULL) the
      // rest of the loader already tolerates
      case StringType       => to_timestamp(col(colName))
      case other =>
        throw new IllegalArgumentException(
          s"events.$colName: unsupported physical type $other " +
            "(expected Long nanos, TIMESTAMP_NTZ, TIMESTAMP, or ISO string)")
    }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
