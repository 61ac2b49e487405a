package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational coverage suite over the testdata star schema.
  *
  * The reference (SURVEY.md §2.8) contains only one join and no
  * window/rollup/set operations — Spark supplies them all as built-ins.
  * These queries exercise that surface so the engine demonstrably answers
  * the full relational vocabulary a user of the reference could ask for,
  * each with a DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout (see SparkEntry):
  *   - double sums go through decimal(38,10): both engines convert a double
  *     to decimal via its shortest decimal representation, so exact decimal
  *     summation yields identical results regardless of row order; final
  *     cast back to double for a stable output type.
  *   - no round() on doubles: Spark rounds the shortest-repr BigDecimal
  *     (0.175 -> 0.18) while DuckDB rounds the true binary value
  *     (0.175 -> 0.17). Use round2() = floor(x*100+0.5)/100 instead —
  *     floor of the same double is engine-independent.
  *   - top-k/rank queries carry an explicit total tie-break.
  *
  * Scale notes: every aggregate here map-side combines before its shuffle;
  * dimension joins broadcast the small side; top-k is
  * TakeOrderedAndProject (per-partition heaps, no global sort).
  */
object Relational {

  private val dec = DecimalType(38, 10)

  /** Deterministic HALF_UP-on-the-double 2-decimal rounding (see above). */
  def round2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + 0.5) / 100.0

  /** Exact sum of a 2-decimal quantity, returned as double through an
    * integer-cents detour: sum in decimal (exact), x100 (an exact integer
    * for 2-decimal inputs), to long, to double (exact below 2^53), /100
    * (one correctly-rounded op). A direct decimal->double CAST is
    * correctly rounded in Spark but DOUBLE-ROUNDED in DuckDB (int128
    * mantissa then scale division), which diverges by 1 ULP once sums
    * reach ~12 significant digits — found comparing at sf0.1; the cents
    * detour is bit-identical in both engines up to 2^53 cents. */
  private def dsum(c: org.apache.spark.sql.Column) =
    (sum(c.cast(dec)) * 100).cast("long").cast("double") / 100.0

  /** Same detour for d-decimal products (d = 4 for price*disc, 6 for
    * price*disc*tax). */
  private def dsumScaled(c: org.apache.spark.sql.Column, pow: Long) =
    (sum(c) * pow).cast("long").cast("double") / pow.toDouble

  /** TPC-H Q1-style pricing summary: scan-heavy agg with pushed-down
    * filter; partial aggregation keeps the shuffle at |groups| rows. */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    // price/discount/tax are 2-decimal quantities: cast each INPUT to
    // decimal(12,2) and multiply in decimal so the product is exact
    // (decimal(38,6) worst case) — a double triple-product rounds
    // differently per engine in the 10th decimal.
    val d2 = DecimalType(12, 2)
    val price = col("l_extendedprice").cast(d2)
    val disc = (lit(1) - col("l_discount")).cast(d2)
    val tax = (lit(1) + col("l_tax")).cast(d2)
    lineitem
      .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsumScaled(price * disc, 10000L).as("sum_disc_price"),
        dsumScaled(price * disc * tax, 1000000L).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Multi-way dim join: region -> nation -> customer -> orders, revenue by
    * nation. region/nation broadcast; orders (the big side) never moves
    * until the final small groupBy. */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("order_cnt"))

  /** Left-semi: customers having at least one high-value order. */
  def bigSpenders(customer: DataFrame, orders: DataFrame, threshold: Double = 450000.0): DataFrame =
    customer
      .join(orders.where(col("o_totalprice") > threshold),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Left-anti: segment counts of customers with no high-value order. */
  def quietSegments(customer: DataFrame, orders: DataFrame, threshold: Double = 450000.0): DataFrame =
    customer
      .join(orders.where(col("o_totalprice") > threshold),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cust_cnt"))

  /** Window function: each customer's single largest order. */
  def topOrderPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  /** ROLLUP over (returnflag, linestatus): subtotals + grand total. */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))

  /** Exact distinct aggregation (single row). */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(concat_ws("~", col("l_returnflag"), col("l_linestatus"))).as("n_flag_status"),
      count(lit(1)).as("n_rows"))

  /** Set operations: heavy-quantity lineitem parts vs large parts.
    * Single-pass form: the naive intersect/except/union-distinct chain
    * scans and re-distincts both inputs once per operator (round-1 plan:
    * 6 scans, 9 shuffles). Here each side is scanned+distinct'd once and
    * ONE full-outer join yields membership flags from which all three
    * counts fall out of a single aggregate (2 scans, and the join reuses
    * the distincts' hash partitioning — the plan that matters at 100 TB). */
  def setOps(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val a = lineitem.where(col("l_quantity") >= 48)
      .select(col("l_partkey").as("key")).distinct().withColumn("in_a", lit(1))
    val b = part.where(col("p_size") >= 40)
      .select(col("p_partkey").as("key")).distinct().withColumn("in_b", lit(1))
    a.join(b, Seq("key"), "full_outer")
      .agg(
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L).otherwise(0L)).as("n_inter"),
        sum(when(col("in_a").isNotNull && col("in_b").isNull, 1L).otherwise(0L)).as("n_except"),
        count(lit(1)).as("n_union"))
      .select(explode(array(
        struct(lit("intersect").as("op"), col("n_inter").as("cnt")),
        struct(lit("except").as("op"), col("n_except").as("cnt")),
        struct(lit("union").as("op"), col("n_union").as("cnt")))).as("r"))
      .select(col("r.op").as("op"), col("r.cnt").as("cnt"))
  }

  /** Exact interpolated quantiles (R-7 / quantile_cont semantics — what
    * both Spark `percentile` and DuckDB `quantile_cont` implement) of the
    * extended price per return flag, floor-rounded for engine-independent
    * float output. Exact percentile sorts per group — the scale story is
    * approx_percentile (t-digest) which trades the sort for a mergeable
    * sketch; this is the oracle-able exact form. */
  def quantiles(lineitem: DataFrame,
                ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(ps.map(lit): _*)).as("qs"))
      .select(col("l_returnflag"),
        posexplode(col("qs")).as(Seq("pos", "q")))
      .select(col("l_returnflag"),
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        (floor(col("q") * 100 + 0.5) / 100.0).as("q"))

  /** The 100 TB twin of [[quantiles]]: approx_percentile (Greenwald-Khanna
    * sketch — bounded memory, mergeable partials, no per-group sort),
    * certified in-plan against the exact form. The sketch guarantees rank
    * error <= 1/accuracy; a value-space oracle can't pin the approx value
    * itself (it's an actual data element, engine-specific), so the query
    * emits the exact quantile plus a boolean asserting the approx landed
    * between the exact quantiles at p +/- 2/accuracy (doubled slack
    * absorbs R-7 interpolation off-by-ones at the rank boundary). Oracle:
    * exact values + TRUE — same discipline as q43's HLL certification.
    * At scale you run ONLY the approx aggregate; this query is its test. */
  def approxQuantilesCertified(lineitem: DataFrame,
                               ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                               accuracy: Int = 1000): DataFrame = {
    val eps = 2.0 / accuracy
    val lo = ps.map(p => math.max(0.0, p - eps))
    val hi = ps.map(p => math.min(1.0, p + eps))
    val x = col("l_extendedprice")
    val k = ps.length
    // ONE exact-percentile aggregate over the concatenated probe list
    // (p's, then lows, then highs): `percentile` buffers every group value
    // per aggregate instance, so three separate calls would hold three
    // copies of that buffer — merged, the memory and sort cost are paid once
    val probes = ps ++ lo ++ hi
    def at(off: Int) = element_at(col("ex"), col("pos") + 1 + off)
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(x, array(probes.map(lit): _*)).as("ex"),
        approx_percentile(x, array(ps.map(lit): _*), lit(accuracy)).as("ap"))
      .select(col("l_returnflag"),
        explode(sequence(lit(0), lit(k - 1))).as("pos"), col("ex"), col("ap"))
      .select(col("l_returnflag"),
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        (floor(at(0) * 100 + 0.5) / 100.0).as("q"),
        (element_at(col("ap"), col("pos") + 1) >= at(k) &&
          element_at(col("ap"), col("pos") + 1) <= at(2 * k)).as("ok"))
  }

  /** CUBE aggregation over (returnflag, linestatus): all 2^2 grouping
    * combinations in one pass (Expand + single aggregate — the same
    * shuffle count as a plain groupBy, with 4x the map-side rows). */
  def cubeSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"))

  /** Scalar-function battery: one pass exercising the string/date/math
    * function surface with engine-portable semantics (every expression
    * here is pinned by the DuckDB oracle, q44). Levenshtein, initcap,
    * translate, date arithmetic, extract fields, bit ops — the everyday
    * vocabulary a user of the engine expects to just work. */
  def scalarBattery(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
      reverse(col("o_orderpriority")).as("pri_rev"),
      length(col("o_orderpriority")).as("pri_len"),
      levenshtein(col("o_orderpriority"), lit("1-URGENT")).as("lev_urgent"),
      translate(col("o_orderpriority"), "-", "_").as("pri_t"),
      concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("joined"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
      datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"),
      (col("o_orderkey").bitwiseAND(255)).as("key_band"),
      pmod(col("o_orderkey") * 2654435761L, lit(1000003L)).as("key_hash"),
      (floor(log10(col("o_totalprice")) * 100 + 0.5) / 100.0).as("log_price2"),
      greatest(col("o_totalprice") - 100000.0, lit(0.0)).as("excess"))

  /** Sketch-based distinct counts: HyperLogLog++ via approx_count_distinct.
    * The exact form (distinctCounts, q12) shuffles every distinct value;
    * the sketch is a fixed-size mergeable register array per group —
    * constant shuffle bytes regardless of cardinality, the only viable
    * shape at 10^11 distinct keys. rsd=0.01 => ~1% standard error
    * (register memory grows as 1/rsd^2). No cross-engine oracle (DuckDB's
    * HLL differs); the ScalaTest bound asserts error vs exact. */
  def approxDistinctCounts(lineitem: DataFrame, rsd: Double = 0.01): DataFrame =
    lineitem.agg(
      approx_count_distinct(col("l_partkey"), rsd).as("n_parts"),
      approx_count_distinct(col("l_suppkey"), rsd).as("n_supps"),
      count(lit(1)).as("n_rows"))

  /** Driver-checkable certification of the HLL sketch (q43): exact counts
    * plus booleans asserting the sketch landed within 3*rsd of exact. The
    * sketch values are engine-specific (DuckDB's HLL differs), so they
    * can't be hash-compared — but exact counts and TRUE invariants can.
    *
    * Plan shape: one groupBy per key column (map-side combine, shuffle
    * carries distinct keys only), then a 1-row agg counting the keys AND
    * sketching them — HLL depends only on the distinct set, so sketching
    * the deduped keys tests the same estimate. Mixing countDistinct and
    * approx_count_distinct in ONE agg instead costs an Expand that
    * re-evaluates every input row once per distinct aggregate (measured
    * 6.2 s vs ~1.5 s at sf0.1). The production-scale operator stays
    * approxDistinctCounts above; this query is its test. */
  def approxDistinctCertified(lineitem: DataFrame, rsd: Double = 0.01): DataFrame = {
    def certify(key: String, exactName: String, okName: String): DataFrame =
      lineitem.groupBy(col(key)).agg(count(lit(1)).as("_mult"))
        .agg(count(lit(1)).as(exactName),
          approx_count_distinct(col(key), rsd).as("_a"))
        .select(col(exactName),
          (abs(col("_a") - col(exactName)).cast("double")
            <= lit(3 * rsd) * col(exactName)).as(okName))
    certify("l_partkey", "n_parts_exact", "parts_ok")
      .crossJoin(certify("l_suppkey", "n_supps_exact", "supps_ok"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_rows")))
      .select(col("n_parts_exact"), col("n_supps_exact"), col("n_rows"),
        col("parts_ok"), col("supps_ok"))
  }

  /** Interval join without an equi-key, shuffle-joinable: Spark plans a
    * raw `l.ts BETWEEN r.start AND r.end` join as BroadcastNestedLoopJoin
    * (every left row against every right row — dead at 100 TB unless one
    * side is tiny). Bucketizing time recovers an equi-join: each left row
    * joins on its time bucket, each interval explodes into the buckets it
    * covers, and the exact predicate runs as a residual filter on the
    * (bucket-matched) candidates. Cost scales with overlap density, not
    * |L|x|R|; pick `bucketSeconds` near the typical interval length so
    * intervals explode into O(1) buckets. A (left, interval) pair meets in
    * exactly one bucket — the left row has one bucket — so no dedup pass
    * is needed. This is the classic MapReduce range-join decomposition
    * (e.g. Chawda et al., "Processing Interval Joins On Map-Reduce",
    * EDBT'14). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightStart: String, rightEnd: String,
                   bucketSeconds: Long = 3600L): DataFrame = {
    val lb = left.withColumn("_b", floor(col(leftTs).cast("long") / bucketSeconds))
    val rb = right.withColumn("_b", explode(sequence(
      floor(col(rightStart).cast("long") / bucketSeconds),
      floor(col(rightEnd).cast("long") / bucketSeconds))))
    lb.join(rb, Seq("_b"))
      .where(col(leftTs) >= col(rightStart) && col(leftTs) < col(rightEnd))
      .drop("_b")
  }

  /** Window-function battery: the full ranking/navigation vocabulary in
    * ONE window specification (one shuffle + one per-partition sort —
    * Spark evaluates all nine functions in a single Window operator when
    * they share the spec). percent_rank/cume_dist are exact rational
    * divisions of window counts, hence engine-portable; the ordering key
    * (o_orderdate, o_orderkey) is total, so RANGE vs ROWS default-frame
    * differences cannot bite. */
  def windowBattery(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.where(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        row_number().over(w).cast("long").as("seq"))
  }

  /** Pivot: event counts per user decile, one column per event type.
    * Explicit value list — with it, Spark skips the extra distinct-values
    * job AND the output schema is stable (an implicit pivot at 100 TB
    * first scans everything just to learn the columns). */
  def eventPivot(events: DataFrame,
                 types: Seq[String] = Seq("view", "click", "purchase", "signup", "error")): DataFrame = {
    val p = events
      .withColumn("user_decile", (col("user_id") % 10).cast("int"))
      .groupBy(col("user_decile"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    // pivot leaves absent (group, value) combinations NULL; a count is 0
    p.select(col("user_decile") +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Running revenue + dense order rank per customer — window frames
    * beyond row_number: a cumulative ROWS frame and dense_rank share one
    * window partition/sort, so Catalyst evaluates both in a single Window
    * operator after a single shuffle+sort on o_custkey. */
  def runningRevenue(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders.select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(col("o_totalprice").cast(dec)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_total"),
      dense_rank().over(w).as("order_seq"))
  }

  /** Grouped top-k: 3 most active users per event_type (explicit tie-break
    * on user_id so the result is a deterministic set). */
  def topUsersPerEventType(events: DataFrame, k: Int = 3): DataFrame = {
    val counts = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").desc, col("user_id").asc)
    counts.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** As-of join (no Spark built-in): for every 'error' event, the most
    * recent strictly-earlier 'click' timestamp of the same user.
    *
    * Spark-first plan: instead of a per-row lookup (the naive correlated
    * subquery) or a range cross-join, tag both event kinds, sort once per
    * user partition, and carry the last click timestamp forward with a
    * window frame ending one row before the current row. One shuffle on
    * user_id, O(n log n) in the partition sort, no explosion — this is the
    * plan that survives 100 TB (a user's history fits a partition; if a
    * single user were skewed, salt the window by day first).
    */
  def lastClickBeforeError(events: DataFrame): DataFrame = {
    val relevant = events
      .where(col("event_type").isin("error", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    relevant
      .withColumn("prev_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .where(col("event_type") === "error")
      .select(
        col("event_id"), col("user_id"),
        date_trunc("millisecond", col("ts")).as("ts_ms"),
        date_trunc("millisecond", col("prev_click_ts")).as("prev_click_ts_ms"))
  }
}
