package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Columnar analytics sink — the Spark-native analog of the reference's
  * ClickHouse table (clickhouse/init.sql:20-22: MergeTree PARTITION BY
  * toYYYYMM(event_ts), ORDER BY (content_id, event_ts)):
  *
  *   - parquet, partitioned by `event_month` (yyyy-MM of event_ts) — the
  *     monthly partition pruning readers get for free;
  *   - rows sorted within files by (content_id, event_ts) — min/max
  *     page/row-group skipping on the clustering key, like the MergeTree
  *     ORDER BY;
  *   - an append-time `processed_ts` audit column (init.sql:18).
  *
  * Each micro-batch is repartitioned by month before the write so a batch
  * produces one file per month it touches instead of
  * (#partitions x #months) small files — at 100 TB the file count, not the
  * bytes, is what kills the downstream metastore/scan planning. */
object ParquetSink {

  def write(batch: DataFrame, dir: String, tsCol: String = "event_ts"): Unit =
    batch
      .withColumn("event_month", date_format(col(tsCol), "yyyy-MM"))
      .withColumn("processed_ts", current_timestamp())
      .repartition(col("event_month"))
      .sortWithinPartitions(col("content_id"), col(tsCol))
      .write
      .mode("append")
      .partitionBy("event_month")
      .parquet(dir)

  /** Compaction: streaming appends leave one file per (micro-batch, month)
    * — after a day of 5 s triggers that is ~17k files/month, and file
    * COUNT (listing, footers, task scheduling) is what degrades first at
    * scale, not bytes. Rewrites each month into `filesPerMonth` files,
    * restoring the (content_id, ts) sort order that makes min/max skipping
    * work. Dynamic partition overwrite: only months present in the data
    * are replaced; run it on recent months, not the whole table. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              filesPerMonth: Int = 1, tsCol: String = "event_ts"): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // localCheckpoint: materializes the read and cuts the file-source
      // lineage so overwriting the same path is legal. At petabyte scale
      // compact month-by-month into a temp prefix + atomic rename instead
      // of holding a month in block storage.
      spark.read.parquet(dir).localCheckpoint()
        .repartition(col("event_month"),
          pmod(xxhash64(col("content_id"), col(tsCol)), lit(filesPerMonth.toLong)))
        .sortWithinPartitions(col("content_id"), col(tsCol))
        .write
        .mode("overwrite")
        .partitionBy("event_month")
        .parquet(dir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
