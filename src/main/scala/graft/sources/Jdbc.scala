package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC dimension scan — the reference's production dimension path
  * (reference pipeline/app.py:60-66: whole-table read of `public.content`
  * from Postgres, re-run per micro-batch; no partitioning options, i.e. a
  * single-partition read).
  *
  * This sandbox has no database (and no JDBC driver jar), so the rest of the
  * engine reads dimensions from parquet (`model.Tables`) and every join
  * semantic is oracled that way. This module keeps the production shape
  * available behind an explicit call: same `JDBCRelation` Spark would build
  * for the reference, plus the two scale options the reference omitted.
  *
  * Scale notes (100 TB deployment):
  *   - A dimension small enough to broadcast should be read single-partition
  *     (the default here, like the reference) — partitioning a 10k-row read
  *     only multiplies connections.
  *   - A large dimension needs `partitionColumn/lowerBound/upperBound/
  *     numPartitions` so executors read slices in parallel; expose them via
  *     [[Partitioning]].
  *   - Catalyst pushes column pruning and filters into the generated SQL
  *     (`JDBCRelation` implements PrunedFilteredScan), so `select`/`where`
  *     on the returned frame become `SELECT cols ... WHERE ...` server-side.
  */
object Jdbc {

  /** Optional parallel-read spec: numeric column + bounds to slice on. */
  final case class Partitioning(column: String, lower: Long, upper: Long,
                                numPartitions: Int)

  /** Pure options builder (unit-testable without a live database). */
  def options(url: String, table: String, user: String, password: String,
              driver: String = "org.postgresql.Driver",
              partitioning: Option[Partitioning] = None): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "driver" -> driver)
    val part = partitioning.fold(Map.empty[String, String]) { p =>
      Map(
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lower.toString,
        "upperBound" -> p.upper.toString,
        "numPartitions" -> p.numPartitions.toString)
    }
    base ++ part
  }

  /** The reference's dimension read (app.py:60-66), production shape.
    * Requires the JDBC driver jar on the executor classpath at runtime —
    * same runtime-resolution contract as the Kafka source (README). */
  def dim(spark: SparkSession, url: String, table: String,
          user: String, password: String,
          driver: String = "org.postgresql.Driver",
          partitioning: Option[Partitioning] = None): DataFrame = {
    val reader = spark.read.format("jdbc")
    options(url, table, user, password, driver, partitioning)
      .foldLeft(reader)((r, kv) => r.option(kv._1, kv._2))
      .load()
  }
}
