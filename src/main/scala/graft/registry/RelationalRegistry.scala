package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops
import graft.ops.{Curate, Relational, Skew, Sql, Stats, TopK}

/** Relational domain registry (round-15 split tranche 6): the
  * SURVEY §2.8 gap-fill family — TPC-H-pattern aggregation/join
  * queries (q06-q15), quantiles/cube/pivot/window batteries
  * (q37-q44, q57), the SQL-text interface (q39/q84/q85), the typed
  * TopK Aggregator twin (q42), salted-skew-proof interval join (q59)
  * and the distributed equi-depth histogram (q86) — each query above
  * its DuckDB oracle. Bodies and SQL moved verbatim; the oracle gate
  * re-ran on the split — byte-identical results. */
private[graft] object RelationalRegistry {

  // integer-cents detour for decimal sums -> double: DuckDB's direct
  // decimal->double cast is double-rounded (int128 then scale) and drifts
  // 1 ULP from Spark's correctly-rounded cast at ~12 significant digits
  private val decSum = (c: String) =>
    s"CAST(CAST(SUM(CAST($c AS DECIMAL(38,10))) * 100 AS BIGINT) AS DOUBLE) / 100"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational coverage (SURVEY.md §2.8) ---
    "q06_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(Tables.lineitem(s, d))),
    "q07_revenue_by_nation" -> ((s, d) =>
      Relational.revenueByNation(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q08_big_spenders" -> ((s, d) =>
      Relational.bigSpenders(Tables.customer(s, d), Tables.orders(s, d))),
    "q09_quiet_segments" -> ((s, d) =>
      Relational.quietSegments(Tables.customer(s, d), Tables.orders(s, d))),
    "q10_top_order_per_customer" -> ((s, d) =>
      Relational.topOrderPerCustomer(Tables.orders(s, d))),
    "q11_rollup" -> ((s, d) =>
      Relational.rollupSummary(Tables.lineitem(s, d))),
    "q12_distinct_counts" -> ((s, d) =>
      Relational.distinctCounts(Tables.lineitem(s, d))),
    "q13_setops" -> ((s, d) =>
      Relational.setOps(Tables.lineitem(s, d), Tables.part(s, d))),
    "q14_top_users_per_event_type" -> ((s, d) =>
      Relational.topUsersPerEventType(Tables.events(s, d), 3)),
    "q15_asof_click" -> ((s, d) =>
      Relational.lastClickBeforeError(Tables.events(s, d))),
    "q37_quantiles" -> ((s, d) =>
      Relational.quantiles(Tables.lineitem(s, d))),
    "q38_cube" -> ((s, d) =>
      Relational.cubeSummary(Tables.lineitem(s, d))),
    // SQL-text interface: the IDENTICAL string runs on Spark and DuckDB
    "q39_sql_shipping_priority" -> ((s, d) =>
      Sql.run(s, d, Sql.shippingPriority)),
    "q40_pivot" -> ((s, d) =>
      Relational.eventPivot(Tables.events(s, d))),
    "q41_running_revenue" -> ((s, d) =>
      Relational.runningRevenue(Tables.orders(s, d))),
    // same contract as q14, executed by the typed TopK Aggregator
    // (bounded k-element partial aggregation) instead of a window sort
    "q42_topk_aggregator" -> ((s, d) =>
      TopK.topUsersPerEventType(Tables.events(s, d), 3)),
    "q44_scalar_battery" -> ((s, d) =>
      Relational.scalarBattery(Tables.orders(s, d))),
    // ranking/navigation window vocabulary, one Window operator
    "q57_window_battery" -> ((s, d) =>
      Relational.windowBattery(Tables.orders(s, d))),
    // pure interval join (no equi-key): events hitting 2-hour windows
    // opened by each signup — bucketized to an equi-join (never a BNLJ)
    "q59_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val promos = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("promo_id"), col("ts").as("promo_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("promo_end"))
      Relational.intervalJoin(
        ev.select(col("event_id"), col("ts")), promos,
        "ts", "promo_start", "promo_end")
        .groupBy(col("promo_id")).agg(count(lit(1)).as("n_hits"))
    }),
    // LATERAL correlated join + WITH RECURSIVE: SQL:1999 constructs run
    // BYTE-IDENTICAL on Spark and DuckDB (the strongest oracle form)
    "q84_lateral" -> ((s, d) => Sql.run(s, d, Sql.lateralTopOrder)),
    "q85_recursive_cte" -> ((s, d) => Sql.run(s, d, Sql.recursivePowers)),
    // equi-depth histogram (the form optimizer stats actually keep): 19
    // exact percentile boundaries by DISTRIBUTED selection (round 5 —
    // the built-in percentile aggregate merges every distinct value into
    // ONE task's buffer, an OOM at 100 TB of near-continuous prices),
    // bucket assignment by literal-boundary comparison in a second pass
    "q86_equidepth_hist" -> ((s, d) =>
      Stats.equiDepthHistogram(Tables.lineitem(s, d), "l_extendedprice",
        buckets = 20)))

  val oracleSql: Map[String, String] = Map(
    "q06_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSum("l_quantity")} sum_qty,
         |  ${decSum("l_extendedprice")} sum_base,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT) AS DOUBLE) / 10000 sum_disc_price,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(12,2)) * CAST(1+l_tax AS DECIMAL(12,2))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 sum_charge,
         |  ${decSum("l_quantity")}/COUNT(*) avg_qty,
         |  COUNT(*) count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q07_revenue_by_nation" ->
      s"""SELECT n_name, ${decSum("o_totalprice")} revenue, COUNT(*) order_cnt
         |FROM orders JOIN customer ON o_custkey=c_custkey
         |JOIN nation ON c_nationkey=n_nationkey
         |JOIN region ON n_regionkey=r_regionkey
         |WHERE r_name='EUROPE' GROUP BY n_name""".stripMargin,
    "q08_big_spenders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 450000)""".stripMargin,
    "q09_quiet_segments" ->
      """SELECT c_mktsegment, COUNT(*) cust_cnt FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey=c.c_custkey AND o.o_totalprice > 450000)
        |GROUP BY c_mktsegment""".stripMargin,
    "q10_top_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) rk
        |  FROM orders) WHERE rk=1""".stripMargin,
    "q11_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) cnt, ${decSum("l_quantity")} sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q12_distinct_counts" ->
      """SELECT COUNT(DISTINCT l_partkey) n_parts, COUNT(DISTINCT l_suppkey) n_supps,
        |  COUNT(DISTINCT l_returnflag || '~' || l_linestatus) n_flag_status,
        |  COUNT(*) n_rows
        |FROM lineitem""".stripMargin,
    "q13_setops" ->
      """WITH a AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity >= 48),
        |b AS (SELECT DISTINCT p_partkey AS k FROM part WHERE p_size >= 40)
        |SELECT 'intersect' op, COUNT(*) cnt FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT 'except' op, COUNT(*) cnt FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |UNION ALL
        |SELECT 'union' op, COUNT(*) cnt FROM (SELECT k FROM a UNION SELECT k FROM b)""".stripMargin,
    "q14_top_users_per_event_type" ->
      """SELECT event_type, user_id, cnt, rk FROM (
        |  SELECT event_type, user_id, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id ASC) rk
        |  FROM (SELECT event_type, user_id, COUNT(*) cnt FROM events GROUP BY 1,2))
        |WHERE rk <= 3""".stripMargin,
    "q15_asof_click" ->
      """SELECT e.event_id, e.user_id, date_trunc('millisecond', e.ts) ts_ms,
        |  date_trunc('millisecond',
        |    (SELECT MAX(date_trunc('microseconds', c.ts)) FROM events c
        |     WHERE c.event_type='click' AND c.user_id=e.user_id
        |       AND (date_trunc('microseconds', c.ts) < date_trunc('microseconds', e.ts)
        |            OR (date_trunc('microseconds', c.ts) = date_trunc('microseconds', e.ts)
        |                AND c.event_id < e.event_id)))) prev_click_ts_ms
        |FROM events e WHERE e.event_type='error'""".stripMargin,
    "q37_quantiles" -> Seq(0.25, 0.5, 0.75, 0.95).map(p =>
      s"""SELECT l_returnflag, CAST($p AS DOUBLE) p,
         |  FLOOR(quantile_cont(l_extendedprice, $p) * 100 + 0.5) / 100.0 q
         |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q38_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) cnt, ${decSum("l_quantity")} sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q39_sql_shipping_priority" -> ops.Sql.shippingPriority,
    "q40_pivot" ->
      """SELECT CAST(user_id % 10 AS INT) user_decile,
        |  COUNT(*) FILTER (event_type = 'view') "view",
        |  COUNT(*) FILTER (event_type = 'click') click,
        |  COUNT(*) FILTER (event_type = 'purchase') purchase,
        |  COUNT(*) FILTER (event_type = 'signup') signup,
        |  COUNT(*) FILTER (event_type = 'error') error
        |FROM events GROUP BY 1""".stripMargin,
    "q41_running_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) running_total,
        |  dense_rank() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_orderdate, o_orderkey) order_seq
        |FROM orders""".stripMargin,
    "q42_topk_aggregator" ->
      """SELECT event_type, user_id, cnt, rk FROM (
        |  SELECT event_type, user_id, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id ASC) rk
        |  FROM (SELECT event_type, user_id, COUNT(*) cnt FROM events GROUP BY 1,2))
        |WHERE rk <= 3""".stripMargin,
    "q44_scalar_battery" ->
      """SELECT o_orderkey,
        |  UPPER(SUBSTR(o_orderpriority, 1, 3)) pri3,
        |  REVERSE(o_orderpriority) pri_rev,
        |  LENGTH(o_orderpriority) pri_len,
        |  levenshtein(o_orderpriority, '1-URGENT') lev_urgent,
        |  translate(o_orderpriority, '-', '_') pri_t,
        |  concat_ws('|', o_orderstatus, o_orderpriority) joined,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) d,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) q_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) days_to_y2k,
        |  o_orderkey & 255 key_band,
        |  (o_orderkey * 2654435761) % 1000003 key_hash,
        |  FLOOR(log10(o_totalprice) * 100 + 0.5) / 100.0 log_price2,
        |  GREATEST(o_totalprice - 100000.0, 0.0) excess
        |FROM orders""".stripMargin,
    "q57_window_battery" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_totalprice, 1) OVER w prev_price,
        |  lead(o_totalprice, 1) OVER w next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) quartile,
        |  percent_rank() OVER w pr,
        |  cume_dist() OVER w cd,
        |  first_value(o_totalprice) OVER w first_price,
        |  nth_value(o_totalprice, 2) OVER w second_price,
        |  CAST(row_number() OVER w AS BIGINT) seq
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q59_interval_join" ->
      """WITH e AS (SELECT event_id, date_trunc('microseconds', ts) ts FROM events),
        |p AS (SELECT event_id promo_id, date_trunc('microseconds', ts) promo_start,
        |        date_trunc('microseconds', ts) + INTERVAL 2 HOUR promo_end
        |      FROM events WHERE event_type = 'signup')
        |SELECT p.promo_id, COUNT(*) n_hits
        |FROM e JOIN p ON e.ts >= p.promo_start AND e.ts < p.promo_end
        |GROUP BY p.promo_id""".stripMargin,
    "q84_lateral" -> ops.Sql.lateralTopOrder,
    "q85_recursive_cte" -> ops.Sql.recursivePowers,
    "q86_equidepth_hist" -> {
      val ps = (1 to 19).map(i => i / 20.0).mkString("[", ", ", "]")
      s"""WITH b AS (SELECT quantile_cont(l_extendedprice, $ps) bnds FROM lineitem)
         |SELECT CAST(len(list_filter(b.bnds, v -> l_extendedprice > v)) AS BIGINT) bucket,
         |  COUNT(*) cnt,
         |  FLOOR(MIN(l_extendedprice) * 100 + 0.5) / 100.0 lo,
         |  FLOOR(MAX(l_extendedprice) * 100 + 0.5) / 100.0 hi
         |FROM lineitem, b GROUP BY 1""".stripMargin
    })
}
