package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming source builders for the CDC fan-out pipeline.
  *
  * The production source is Kafka (reference pipeline/app.py:39-42:
  * subscribe `cdc.public.engagement_events`, startingOffsets=latest); tests
  * and local runs use MemoryStream / file sources, which exercise the same
  * downstream plan — the contract either way is "a streaming DataFrame with
  * a string `json` column carrying a Debezium envelope per row".
  */
object Sources {

  /** Kafka CDC source, faithful to the reference's four options. The
    * kafka connector is resolved at runtime by format name — the library
    * itself has no compile-time Kafka dependency. */
  def kafkaCdc(spark: SparkSession, bootstrapServers: String,
               topic: String = "cdc.public.engagement_events",
               startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("json")) // reference F1 (app.py:44)

  /** File-drop source with the same contract (one JSON envelope per line) —
    * the local/test stand-in for Kafka. */
  def fileJson(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir).select(col("value").as("json"))
}
