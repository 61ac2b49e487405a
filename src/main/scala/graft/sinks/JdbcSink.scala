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

  /** The foreachBatch effectively-once recipe for JDBC targets: skip the
    * whole batch when its id is already recorded in a commits table, else
    * write then record. This is the guard Structured Streaming's docs
    * prescribe for non-transactional batch sinks — replayed micro-batches
    * (checkpoint recovery re-delivers the last uncommitted batch) become
    * no-ops instead of duplicate inserts. Returns true when data was
    * written, false when the batch was skipped as already committed.
    *
    * Honest failure window: the data write and the commit mark are TWO
    * JDBC operations (Spark's JDBC writer opens per-partition connections,
    * so one enclosing transaction is impossible) — a crash between them
    * re-inserts that batch on replay. Close the window at the TABLE:
    * a unique key + upsert DDL (ReplacingMergeTree, ON CONFLICT), exactly
    * as the reference's receiver dedups replayed HTTP posts by
    * Idempotency-Key (external-api/app.py:6-12). The commit mark itself
    * is replay-safe: the (sink, batch_id) primary key turns a concurrent
    * duplicate mark into a caught constraint violation. */
  def writeBatchOnce(df: DataFrame, batchId: Long, url: String, table: String,
                     user: String = "", password: String = "",
                     driver: String = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
                     commitsTable: String = "graft_commits",
                     batchSize: Int = 10000): Boolean = {
    import java.sql.DriverManager
    Class.forName(driver)
    def withConn[A](f: java.sql.Connection => A): A = {
      val c = DriverManager.getConnection(url, user, password)
      try f(c) finally c.close()
    }
    val committed = withConn { c =>
      try {
        c.createStatement().executeUpdate(
          s"CREATE TABLE $commitsTable (sink VARCHAR(256) NOT NULL, " +
            "batch_id BIGINT NOT NULL, PRIMARY KEY (sink, batch_id))")
      } catch { case _: java.sql.SQLException => () } // already exists
      val ps = c.prepareStatement(
        s"SELECT 1 FROM $commitsTable WHERE sink = ? AND batch_id = ?")
      ps.setString(1, table); ps.setLong(2, batchId)
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    }
    if (committed) false
    else {
      write(df, url, table, user, password, driver, batchSize = batchSize)
      withConn { c =>
        val ins = c.prepareStatement(
          s"INSERT INTO $commitsTable (sink, batch_id) VALUES (?, ?)")
        ins.setString(1, table); ins.setLong(2, batchId)
        try { ins.executeUpdate(); () }
        catch { case _: java.sql.SQLIntegrityConstraintViolationException => () }
      }
      true
    }
  }
}
