package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC warehouse write sink — the production analog of the reference's
  * ClickHouse insert (reference pipeline/app.py:81-86 collects each batch
  * to the driver and inserts via the ClickHouse client; clickhouse/init.sql
  * defines the target table). This sink keeps the write distributed:
  * Spark's JDBC data source writes from EXECUTORS, one connection per
  * partition, statements grouped with addBatch/executeBatch every
  * `batchSize` rows — no driver collect at any size.
  *
  * Completes the S2/K2 round trip with [[graft.sources.Jdbc]]: same
  * options builder shape, so a table written here reads back through
  * `Jdbc.dim` with the same URL/driver.
  *
  * Scale and semantics notes (100 TB deployment):
  *   - One connection per input partition: `coalesce` wide outputs down to
  *     what the database accepts (a 2000-partition insert storm is a
  *     self-inflicted DDoS); `repartition` tiny outputs up for parallelism.
  *   - `SaveMode.Append` per micro-batch is the streaming contract
  *     (foreachBatch). Batch replay after a failure re-inserts the batch —
  *     the reference accepts the same (README.md:249-255 "effectively
  *     once"); make the target table idempotent (ReplacingMergeTree, or a
  *     txn id unique key) when exactly-once matters.
  *   - `truncate=true` with `SaveMode.Overwrite` empties the table instead
  *     of DROP+CREATE, preserving DDL (indexes, codecs) the way a
  *     warehouse-managed schema needs.
  *   - `isolationLevel=NONE` skips transaction setup for append-only
  *     analytics tables; leave READ_UNCOMMITTED+ for tables with readers
  *     expecting atomic batches.
  */
object JdbcSink {

  /** Pure options builder (unit-testable without a live database). */
  def options(url: String, table: String, user: String, password: String,
              driver: String,
              batchSize: Int = 10000,
              isolationLevel: String = "READ_UNCOMMITTED",
              truncate: Boolean = false): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "driver" -> driver,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolationLevel,
      "truncate" -> truncate.toString)

  /** Executor-side batched write of `df` into `table`. */
  def write(df: DataFrame, url: String, table: String,
            user: String = "", password: String = "",
            driver: String = "org.postgresql.Driver",
            mode: SaveMode = SaveMode.Append,
            batchSize: Int = 10000,
            isolationLevel: String = "READ_UNCOMMITTED",
            truncate: Boolean = false): Unit =
    df.write.format("jdbc")
      .options(options(url, table, user, password, driver,
        batchSize, isolationLevel, truncate))
      .mode(mode)
      .save()
}
