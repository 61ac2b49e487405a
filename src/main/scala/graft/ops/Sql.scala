package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Tables

/** ANSI-SQL text interface: the testdata star schema registered as temp
  * views so `spark.sql(...)` works against the same tables the DataFrame
  * operators read. Queries written in the shared dialect (ANSI constructs
  * both Spark and DuckDB parse) run BYTE-IDENTICAL on both engines — the
  * strongest form of the oracle check, exercising Spark's SQL parser,
  * analyzer and Catalyst end-to-end rather than just the DataFrame DSL. */
object Sql {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      (t match {
        case "events" => Tables.events(spark, sfDir) // ns->us ts normalization
        case _ => Tables.load(spark, sfDir, t)
      }).createOrReplaceTempView(t)
    }

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(sql)
  }

  /** Correlated scalar subqueries (COUNT and SUM, decorrelated by
    * Catalyst into joins) + correlated EXISTS, in the shared dialect.
    * All arithmetic integer-cents (FLOOR(x*100+0.5)) — a double AVG here
    * would make the FILTER BOUNDARY order-dependent and break the
    * cross-engine hash (double addition is not associative; DuckDB also
    * rounds double->bigint casts where Spark truncates). */
  val bigSpendersCorrelated: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) total_cents
      |FROM orders o
      |WHERE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
      |      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |    > 2 * (SELECT SUM(CAST(FLOOR(o3.o_totalprice * 100 + 0.5) AS BIGINT))
      |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      |  AND EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_custkey = o.o_custkey
      |                AND c.c_mktsegment = 'BUILDING')""".stripMargin

  /** Explicit GROUPING SETS — the general form rollup/cube specialize. */
  val groupingSets: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) cnt
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  /** LATERAL correlated-subquery join (SQL:1999), shared dialect: for
    * each customer, the lateral derived table sees the outer row —
    * Catalyst plans it via DecorrelateInnerQuery into a join, DuckDB
    * likewise; the per-customer top-order shape that would otherwise
    * need a window + filter. */
  val lateralTopOrder: String =
    """SELECT c.c_custkey, t.o_orderkey, t.cents
      |FROM customer c,
      |LATERAL (SELECT o_orderkey,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) cents
      |  FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY cents DESC, o_orderkey ASC
      |  LIMIT 1) t
      |WHERE c.c_custkey < 200""".stripMargin

  /** WITH RECURSIVE (SQL:1999), shared dialect: a recursive generator
    * (powers of two) joined back to a table with a correlated scalar —
    * exercises Spark 4's recursive-CTE execution (UnionLoop) against
    * DuckDB's on the identical string. */
  val recursivePowers: String =
    """WITH RECURSIVE p(n) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT n * 2 FROM p WHERE n < 4096
      |)
      |SELECT n,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderkey <= n) n_orders
      |FROM p""".stripMargin

  /** TPC-H Q3-shaped shipping-priority query, in the shared dialect —
    * 3-table join, date-range filters, decimal-exact revenue, top-10. */
  val shippingPriority: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin
}
