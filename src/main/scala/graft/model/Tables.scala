package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Conf

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS): Spark 4 cannot represent nanosecond timestamps,
  * so we read it as a Long (spark.sql.legacy.parquet.nanosAsLong=true) and
  * truncate to microseconds with integer division. `/` would go through
  * Double and lose precision (ns epoch ~1.7e18 > 2^53), hence `div`.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Conf.ensure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with `ts` as a proper microsecond TimestampType. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

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
