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
}
