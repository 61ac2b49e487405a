package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops
import graft.ops.{Analytics, Cdc, FuzzyJoin, Graph, HeavyHitters,
  Quality, Sessionize, Similarity, Skew, Sql, Stats, Variants}

/** Warehouse-analytics domain registry: the relational/event-series
  * operators next to the training-data families — sessionization
  * (q35/q62), CDC latest-wins and SCD2 (q51/q95/q101), variant JSON
  * columns (q54), ANALYZE stats and histograms (q55/q72-adjacent/
  * q74), salted skew aggregation (q58), data-quality checks (q60),
  * snapshot diff (q61), unpivot and grouping sets and correlated SQL
  * (q63/q65/q64), Misra-Gries heavy hitters (q66), calendar resample
  * (q67), group centroids (q70), fuzzy entity joins (q71), try_cast
  * (q76), int8 quantization (q80), drift (q89), rolling spikes (q92),
  * funnels and retention (q98/q99), PageRank (q102), as-of dimension
  * joins (q103), and the Avro roundtrip (q113). Mechanical move out
  * of SparkEntry (registry-split tranche 16): queries and SQL moved
  * verbatim; the oracle gate re-ran on the split — byte-identical
  * results. */
private[graft] object AnalyticsRegistry {

  /** Shared by q95 (full-log SCD2 rebuild) and q101 (incremental merge of
    * the second half into the first half's history) — the merge contract
    * is exact equivalence with the rebuild. */
  private val scd2OracleSql: String =
    """WITH c AS (SELECT event_id % 997 k, event_id, user_id, event_type,
      |    CASE WHEN event_id % 11 = 0 THEN 'd'
      |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END op
      |  FROM events),
      |v AS (SELECT *, event_id valid_from,
      |    lead(event_id) OVER (PARTITION BY k ORDER BY event_id) valid_to
      |  FROM c)
      |SELECT k, event_id, user_id, event_type, op, valid_from, valid_to,
      |  valid_to IS NULL is_current
      |FROM v WHERE op <> 'd'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sessions" -> ((s, d) =>
      Sessionize.sessions(Tables.events(s, d), "user_id", "ts", gapMinutes = 60)),
    // CDC materialization: synthesize a change stream (inserts/updates/
    // deletes keyed on event_id % 997, versioned by (ts, event_id)) and
    // collapse it to the current table image — the upsert-mode consumer
    // the reference's insert-only pipeline stops short of
    "q51_cdc_latest" -> ((s, d) => {
      val changes = Tables.events(s, d).select(
        (col("event_id") % 997).as("k"),
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_id") % 11 === 0, "d")
          .when(col("event_id") % 3 === 0, "u")
          .otherwise("c").as("op"))
      Cdc.latestImage(changes, Seq("k"), Seq("ts", "event_id"))
        .select(col("k"), col("event_id"), col("user_id"), col("event_type"), col("op"))
    }),
    // Spark 4 VariantType: parse the props JSON once into the shredded
    // binary encoding, typed variant_get extraction, plain agg after
    "q54_variant" -> ((s, d) =>
      Variants.propsSummary(Tables.events(s, d))),
    // ANALYZE-style statistics: one scan, all columns at once
    "q55_column_stats" -> ((s, d) =>
      Stats.numericColumnStats(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_partkey"))),
    // skew-safe two-phase aggregation — oracled against the PLAIN groupBy,
    // proving the salted decomposition is semantically invisible
    "q58_salted_agg" -> ((s, d) =>
      Skew.saltedCount(Tables.events(s, d), "event_type")),
    // data-quality expectation battery: tiny output regardless of input
    // size — the publish gate a production pipeline runs per batch
    "q60_dq_checks" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      val ev = Tables.events(s, d)
      // the three orders checks fuse into ONE scan of orders (childBattery);
      // the events domain check is the only other scan — 3 table reads
      // total where the per-check formulation paid 5
      Quality.childBattery(orders, "o_orderkey", "o_custkey", "o_orderdate",
          customer, "c_custkey",
          "orders_pk_unique", "orders_custkey_fk", "orders_date_nulls")
        .unionAll(Quality.domainViolations(ev, "event_type",
            Seq("view", "click", "purchase", "signup", "error"))
          .select(lit("events_type_domain").as("check"),
            col("violations").cast("long").as("violations")))
    }),
    // wide->long unpivot (melt): per-metric rows at scan speed (Expand)
    "q63_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d).unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax")),
        "metric", "v")),
    // correlated scalar subqueries + EXISTS, IDENTICAL SQL on both engines
    "q64_correlated_sql" -> ((s, d) =>
      Sql.run(s, d, Sql.bigSpendersCorrelated)),
    // explicit GROUPING SETS, IDENTICAL SQL on both engines
    "q65_grouping_sets" -> ((s, d) =>
      Sql.run(s, d, Sql.groupingSets)),
    // error-tolerant parsing battery: TRY_CAST semantics (dirty strings
    // -> NULL, never a failed job) — the cleaning pass run before typed
    // ingestion; identical function in both engines
    "q76_try_cast" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").as("pri_num"),
        expr("try_cast(o_orderpriority AS BIGINT)").as("junk_num"),
        expr("try_cast(cast(o_totalprice AS STRING) AS DOUBLE)").as("price_rt"),
        expr("try_cast(o_orderstatus AS DATE)").as("junk_date"),
        expr("try_cast(concat('19', substr(o_orderpriority, 1, 1), '0-01-01') AS DATE)")
          .as("built_date"))),
    // int8 embedding quantization: per-vector symmetric scale + codes —
    // the 4x compression an ANN index applies before sharding; max|x|
    // materialized behind a Generate barrier so the per-element lambda
    // divides by an attribute, not a re-reduced expression. The oracle
    // form posexplodes the codes to scalar (pos, code) rows — the array
    // column crashed the driver's pandas comparator in round 4, same
    // class as q33's array<float>; quantizeInt8 (array form) stays the API
    "q80_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d))
        .select(col("vec_id"), col("scale_e9"),
          posexplode(col("codes")).as(Seq("pos", "code")))),
    // fixed-range histogram: 20 equal-width bins (portable floor
    // arithmetic — neither engine needs width_bucket), per-bin bounds
    "q74_histogram" -> ((s, d) => {
      val x = col("l_extendedprice")
      val b = least(greatest(floor((x - 900.0) / 104100.0 * 20), lit(0.0)), lit(19.0))
        .cast("long")
      Tables.lineitem(s, d)
        .groupBy(b.as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          (floor(min(x) * 100 + 0.5) / 100.0).as("lo"),
          (floor(max(x) * 100 + 0.5) / 100.0).as("hi"))
    }),
    // distribution drift between two snapshot cuts of lineitem prices:
    // per-bucket counts + INTEGER-EXACT TVD numerators (no ln(), so the
    // figure is bit-identical in any engine)
    "q89_drift" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      Quality.distributionDrift(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        _ => floor(col("l_extendedprice") / 10000.0).cast("long"))
    }),
    // as-of dimension lookup against the SCD2 history: each probe fact
    // retrieves the version valid at its sequence point — equi-join on
    // the key, validity range as a filter, at most one match per probe
    "q103_asof_dim" -> ((s, d) => {
      val changes = Tables.events(s, d).select(
        (col("event_id") % 997).as("k"),
        col("event_id"), col("user_id"), col("event_type"),
        when(col("event_id") % 11 === 0, "d")
          .when(col("event_id") % 3 === 0, "u")
          .otherwise("c").as("op"))
      val probes = Tables.events(s, d)
        .where(col("event_id") % 5 === 2)
        .select((col("event_id") % 997).as("k"), col("event_id").as("probe_seq"))
      Cdc.asOfLookup(Cdc.scd2(changes, Seq("k"), "event_id"),
        probes, Seq("k"), "probe_seq")
        .select(col("k"), col("probe_seq"), col("event_id").as("version_id"),
          col("user_id"), col("event_type"))
    }),
    // fixed-iteration PageRank in integer-exact micro-rank arithmetic
    // (floored contributions + damping) over the user->content
    // interaction graph — bit-identical ranks in any engine, oracled by
    // the same three unrolled iterations in SQL
    "q102_pagerank" -> ((s, d) =>
      Graph.pageRankFixed(Tables.events(s, d).select(
        col("user_id").as("src"), (col("event_id") % 97).as("dst")), iters = 3)),
    // incremental SCD2: history built from the first half of the change
    // log, then the second half MERGED in — must equal the full-log
    // rebuild, so it runs against q95's oracle (same shared-oracle
    // discipline as q91 vs q68)
    "q101_scd2_merge" -> ((s, d) => {
      val changes = Tables.events(s, d).select(
        (col("event_id") % 997).as("k"),
        col("event_id"), col("user_id"), col("event_type"),
        when(col("event_id") % 11 === 0, "d")
          .when(col("event_id") % 3 === 0, "u")
          .otherwise("c").as("op"))
      val cut = 5000L // event_ids are 0..n; seq == event_id, log ordered by it
      Cdc.scd2Merge(
        Cdc.scd2(changes.where(col("event_id") < cut), Seq("k"), "event_id"),
        changes.where(col("event_id") >= cut), Seq("k"), "event_id")
        .select(col("k"), col("event_id"), col("user_id"), col("event_type"),
          col("op"), col("valid_from"), col("valid_to"), col("is_current"))
    }),
    // ordered funnel over the engagement stream: first click strictly
    // after first view, first purchase strictly after that click — the
    // drop-off question the reference's warehouse tables exist to answer
    "q98_funnel" -> ((s, d) =>
      Analytics.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))),
    // weekly cohort retention: integer week indexes, two aggs over the
    // deduplicated (user, week) frame
    "q99_retention" -> ((s, d) =>
      Analytics.retention(Tables.events(s, d))),
    // Avro interop WITHOUT the spark-avro jar (sources/Avro, avro-core +
    // avro-mapred): a deterministic orders slice is written as deflate
    // Avro containers and read back through the splittable
    // AvroKeyInputFormat path; the oracle computes the same aggregate
    // straight from parquet, so any value/type drift through the Avro
    // long/string/double/timestamp encodings breaks the hash
    "q113_avro_roundtrip" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_avro_q113").getAbsolutePath
      graft.sources.Avro.write(
        Tables.orders(s, d).where(col("o_orderkey") % 20 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
        dir)
      graft.sources.Avro.read(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("sum_keys"),
          ((sum(col("o_totalprice").cast("decimal(38,10)")) * 100)
            .cast("long").cast("double") / 100.0).as("sum_price"),
          min(col("o_orderdate")).as("first_dt"),
          max(col("o_orderdate")).as("last_dt"))
    }),
    // SCD2 history table from the same CDC change log q51 collapses to a
    // latest image: one version row per non-delete change, valid over
    // [valid_from, next change) in the change-id order — deletes close
    // the last open version
    "q95_scd2" -> ((s, d) => {
      val changes = Tables.events(s, d).select(
        (col("event_id") % 997).as("k"),
        col("event_id"), col("user_id"), col("event_type"),
        when(col("event_id") % 11 === 0, "d")
          .when(col("event_id") % 3 === 0, "u")
          .otherwise("c").as("op"))
      Cdc.scd2(changes, Seq("k"), "event_id")
        .select(col("k"), col("event_id"), col("user_id"), col("event_type"),
          col("op"), col("valid_from"), col("valid_to"), col("is_current"))
    }),
    // rolling ingest-volume spike monitor: planted 4x day (one date's
    // rows replicated via explode, ONE scan — not a 4-way self-union)
    // must fire; integer-only flag
    "q92_rolling_spikes" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-04-01"))
        .select(col("o_orderdate"),
          explode(sequence(lit(1),
            when(col("o_orderdate") === lit("1995-02-15"), lit(4))
              .otherwise(lit(1)))).as("_rep"))
      Quality.rollingSpikes(o, "o_orderdate")
    }),
    // fuzzy string join (entity resolution): dirty part names (one char
    // deleted) matched back to their sources via token-postings
    // candidates + levenshtein verify — never the |L|x|R| matrix
    "q71_fuzzy_join" -> ((s, d) => {
      val clean = Tables.part(s, d).where(col("p_partkey") < 2000)
        .select(col("p_partkey").as("clean_id"), col("p_name").as("clean_name"))
      val dirty = clean.select((col("clean_id") + 100000L).as("dirty_id"),
        concat(substring(col("clean_name"), 1, 2),
          substring(col("clean_name"), 4, 1000)).as("dirty_name"))
      // testdata p_names are TWO tokens and the corruption always damages
      // word 1, so every true pair shares exactly one token —
      // minSharedTokens must stay 1 here (2 would drop all 123k true
      // pairs). Candidate pruning comes from the exact length-band +
      // bag-of-chars bounds inside FuzzyJoin.candidates; note true pairs
      // are ~25% of the old candidate set, so any identical-output
      // reduction is capped at ~4x on this corpus.
      FuzzyJoin.join(dirty, clean, "dirty_id", "dirty_name",
        "clean_id", "clean_name", maxDist = 2)
    }),
    // per-language embedding centroids (class prototypes): flat
    // (group, dim, value) rows, integer-scaled for engine-exact means
    "q70_group_centroids" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id").as("vec_id"), col("lang"))
      Similarity.groupCentroids(Tables.embeddings(s, d).join(docs, "vec_id"), "lang")
    }),
    // time-series gap fill: calendar grid (sequence/generate_series) LEFT
    // JOIN counts, zeros for silent days — resample at grid size cost
    "q67_resample" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val days = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1995-01-01")),
        lit(java.sql.Date.valueOf("1995-03-31")),
        expr("interval 1 day"))).as("day"))
      val counts = o
        .where(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-04-01"))
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      days.join(counts, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    }),
    // Misra-Gries heavy hitters: fixed-m mergeable sketch (the 100 TB
    // vocabulary path — exact form q52 shuffles every distinct token);
    // certified via order-independent invariants, like q43/q45
    "q66_heavy_hitters" -> ((s, d) =>
      HeavyHitters.certifiedTopTokens(Tables.documents(s, d), k = 10, m = 16)),
    // the engine-native session operator: groupBy(session_window) — same
    // boundaries as q35's manual lag/cumsum form (oracle derives one from
    // the other: window end = last event + gap by definition)
    "q62_session_window" -> ((s, d) =>
      Sessionize.sessionWindows(Tables.events(s, d), "user_id", "ts", gapMinutes = 60)),
    // snapshot diff: synthesize before/after versions of events and emit
    // row-level adds/removes/changes — output scales with churn only
    "q61_snapshot_diff" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
      val before = ev.where(col("event_id") % 13 =!= 0)
      val after = ev.where(col("event_id") % 17 =!= 0)
        .withColumn("value",
          when(col("event_id") % 7 === 0, col("value") + 1).otherwise(col("value")))
      Quality.snapshotDiff(before, after, "event_id", Seq("event_type", "value"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q35_sessions" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) tsu,
        |             epoch_us(date_trunc('microseconds', ts)) us FROM events),
        |b AS (SELECT user_id, event_id, tsu, us,
        |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                  > 3600000000 THEN 1 ELSE 0 END bnd
        |      FROM e),
        |s AS (SELECT user_id, tsu,
        |        CAST(SUM(bnd) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) session_idx
        |      FROM b)
        |SELECT user_id, session_idx, COUNT(*) n_events,
        |  MIN(tsu) session_start, MAX(tsu) session_end,
        |  (epoch_us(MAX(tsu)) - epoch_us(MIN(tsu))) / 1000000.0 duration_s
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    // derived from the q35 lag/cumsum form: session_window's end is
    // last_event + gap by definition
    "q62_session_window" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('microseconds', ts) tsu,
        |             epoch_us(date_trunc('microseconds', ts)) us FROM events),
        |b AS (SELECT user_id, event_id, tsu, us,
        |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |                  > 3600000000 THEN 1 ELSE 0 END bnd
        |      FROM e),
        |s AS (SELECT user_id, tsu,
        |        CAST(SUM(bnd) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) session_idx
        |      FROM b)
        |SELECT user_id, MIN(tsu) session_start,
        |  MAX(tsu) + INTERVAL 1 HOUR session_end, COUNT(*) n_events
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q51_cdc_latest" ->
      """WITH c AS (SELECT event_id % 997 k, event_id,
        |    epoch_us(date_trunc('microseconds', ts)) us, user_id, event_type,
        |    CASE WHEN event_id % 11 = 0 THEN 'd'
        |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END op
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY k ORDER BY us DESC, event_id DESC) rn FROM c)
        |SELECT k, event_id, user_id, event_type, op FROM r
        |WHERE rn = 1 AND op <> 'd'""".stripMargin,
    "q54_variant" ->
      """SELECT event_type, COUNT(*) n, COUNT(k) n_k,
        |  CAST(SUM(k) AS BIGINT) sum_k, MIN(k) min_k, MAX(k) max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS BIGINT) k FROM events)
        |GROUP BY event_type""".stripMargin,
    "q55_column_stats" -> Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_partkey").map(c =>
      s"""SELECT '$c' "column", COUNT($c) n_nonnull,
         |  COUNT(*) - COUNT($c) n_null,
         |  CAST(MIN($c) AS DOUBLE) min_d, CAST(MAX($c) AS DOUBLE) max_d
         |FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q58_salted_agg" ->
      "SELECT event_type, COUNT(*) cnt FROM events GROUP BY event_type",
    "q60_dq_checks" ->
      """SELECT 'orders_pk_unique' "check", CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) violations
        |FROM (SELECT COUNT(*) n FROM orders GROUP BY o_orderkey)
        |UNION ALL
        |SELECT 'orders_custkey_fk', COUNT(*) FROM orders
        |WHERE o_custkey IS NOT NULL
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'events_type_domain', COUNT(*) FROM events
        |WHERE event_type IS NOT NULL
        |  AND event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error')
        |UNION ALL
        |SELECT 'orders_date_nulls', COUNT(*) FROM orders
        |WHERE o_orderdate IS NULL""".stripMargin,
    "q61_snapshot_diff" ->
      """WITH e AS (SELECT event_id, event_type, "value" FROM events),
        |b AS (SELECT * FROM e WHERE event_id % 13 <> 0),
        |a AS (SELECT event_id, event_type,
        |        CASE WHEN event_id % 7 = 0 THEN "value" + 1 ELSE "value" END "value"
        |      FROM e WHERE event_id % 17 <> 0)
        |SELECT event_id, change FROM (
        |  SELECT COALESCE(b.event_id, a.event_id) event_id,
        |    CASE WHEN b.event_id IS NULL THEN 'added'
        |         WHEN a.event_id IS NULL THEN 'removed'
        |         WHEN b.event_type <> a.event_type OR b."value" <> a."value"
        |           THEN 'changed' END change
        |  FROM b FULL OUTER JOIN a ON b.event_id = a.event_id)
        |WHERE change IS NOT NULL""".stripMargin,
    "q64_correlated_sql" -> ops.Sql.bigSpendersCorrelated,
    "q74_histogram" ->
      """SELECT CAST(LEAST(GREATEST(
        |    FLOOR((l_extendedprice - 900.0) / 104100.0 * 20), 0.0), 19.0) AS BIGINT) bucket,
        |  COUNT(*) cnt,
        |  FLOOR(MIN(l_extendedprice) * 100 + 0.5) / 100.0 lo,
        |  FLOOR(MAX(l_extendedprice) * 100 + 0.5) / 100.0 hi
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q76_try_cast" ->
      """SELECT o_orderkey,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) pri_num,
        |  TRY_CAST(o_orderpriority AS BIGINT) junk_num,
        |  TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) price_rt,
        |  TRY_CAST(o_orderstatus AS DATE) junk_date,
        |  TRY_CAST(concat('19', substr(o_orderpriority, 1, 1), '0-01-01') AS DATE) built_date
        |FROM orders""".stripMargin,
    "q80_quantize_int8" ->
      """WITH t AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) e
        |  FROM embeddings),
        |m AS (SELECT vec_id, e,
        |    list_max(list_transform(e, x -> abs(x))) mx FROM t)
        |SELECT vec_id,
        |  CAST(FLOOR(mx / 127.0 * 1e9 + 0.5) AS BIGINT) scale_e9,
        |  unnest(range(0, len(e))) pos,
        |  unnest(CASE WHEN mx = 0 THEN list_transform(e, x -> 0)
        |       ELSE list_transform(e, x -> CAST(round(x / (mx / 127.0)) AS INTEGER))
        |  END) code
        |FROM m""".stripMargin,
    "q71_fuzzy_join" ->
      """WITH clean AS (SELECT p_partkey clean_id, p_name clean_name
        |               FROM part WHERE p_partkey < 2000),
        |dirty AS (SELECT clean_id + 100000 dirty_id,
        |            substr(clean_name, 1, 2) || substr(clean_name, 4) dirty_name
        |          FROM clean)
        |SELECT dirty_id, clean_id,
        |  CAST(levenshtein(dirty_name, clean_name) AS BIGINT) dist
        |FROM dirty, clean
        |WHERE levenshtein(dirty_name, clean_name) <= 2""".stripMargin,
    "q70_group_centroids" ->
      """WITH j AS (SELECT d.lang, e.embedding FROM embeddings e
        |           JOIN documents d ON e.vec_id = d.doc_id),
        |x AS (SELECT lang, unnest(range(1, len(embedding) + 1)) dim,
        |        CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
        |             AS BIGINT) sv
        |      FROM j)
        |SELECT lang, CAST(dim AS BIGINT) dim,
        |  FLOOR(CAST(SUM(sv) AS DOUBLE) / COUNT(*) + 0.5) / 1000000.0 centroid
        |FROM x GROUP BY lang, dim""".stripMargin,
    "q89_drift" ->
      """WITH cb AS (SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) bucket,
        |    COUNT(*) cnt_before FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
        |ca AS (SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) bucket,
        |    COUNT(*) cnt_after FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1),
        |j AS (SELECT COALESCE(cb.bucket, ca.bucket) bucket,
        |    COALESCE(cnt_before, 0) cnt_before, COALESCE(cnt_after, 0) cnt_after
        |  FROM cb FULL OUTER JOIN ca ON cb.bucket = ca.bucket),
        |k AS (SELECT bucket, cnt_before, cnt_after,
        |    SUM(cnt_before) OVER () tb, SUM(cnt_after) OVER () ta FROM j),
        |m AS (SELECT bucket, cnt_before, cnt_after, tb, ta,
        |    ABS(cnt_before * ta - cnt_after * tb) drift_num FROM k)
        |SELECT bucket, cnt_before, cnt_after, CAST(drift_num AS BIGINT) drift_num,
        |  CAST(SUM(drift_num) OVER () AS DOUBLE)
        |    / (CAST(2 AS DOUBLE) * tb * ta) tvd
        |FROM m""".stripMargin,
    "q103_asof_dim" ->
      """WITH c AS (SELECT event_id % 997 k, event_id, user_id, event_type,
        |    CASE WHEN event_id % 11 = 0 THEN 'd'
        |         WHEN event_id % 3 = 0 THEN 'u' ELSE 'c' END op
        |  FROM events),
        |v AS (SELECT *, event_id valid_from,
        |    lead(event_id) OVER (PARTITION BY k ORDER BY event_id) valid_to
        |  FROM c),
        |h AS (SELECT * FROM v WHERE op <> 'd'),
        |probes AS (SELECT event_id % 997 k, event_id probe_seq FROM events
        |           WHERE event_id % 5 = 2)
        |SELECT p.k, p.probe_seq, h.event_id version_id, h.user_id, h.event_type
        |FROM probes p JOIN h ON p.k = h.k AND p.probe_seq >= h.valid_from
        |  AND (h.valid_to IS NULL OR p.probe_seq < h.valid_to)""".stripMargin,
    "q102_pagerank" ->
      """WITH e AS (SELECT user_id src, event_id % 97 dst FROM events),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src node FROM e UNION ALL SELECT dst FROM e)),
        |deg AS (SELECT src, COUNT(*) deg FROM e GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) rank_e6 FROM nodes),
        |c1 AS (SELECT e.dst node, SUM(r0.rank_e6 // d.deg) in_c
        |       FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c1.in_c, 0)) // 100 AS BIGINT) rank_e6
        |       FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst node, SUM(r1.rank_e6 // d.deg) in_c
        |       FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c2.in_c, 0)) // 100 AS BIGINT) rank_e6
        |       FROM nodes n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst node, SUM(r2.rank_e6 // d.deg) in_c
        |       FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(c3.in_c, 0)) // 100 AS BIGINT) rank_e6
        |       FROM nodes n LEFT JOIN c3 USING (node))
        |SELECT node, rank_e6 FROM r3""".stripMargin,
    "q98_funnel" ->
      """WITH e AS (SELECT user_id u,
        |    epoch_us(date_trunc('microseconds', ts)) t, event_type et FROM events),
        |s1 AS (SELECT u, MIN(t) t FROM e WHERE et = 'view' GROUP BY 1),
        |s2 AS (SELECT e.u, MIN(e.t) t FROM e JOIN s1 ON e.u = s1.u AND e.t > s1.t
        |       WHERE et = 'click' GROUP BY 1),
        |s3 AS (SELECT e.u, MIN(e.t) t FROM e JOIN s2 ON e.u = s2.u AND e.t > s2.t
        |       WHERE et = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) stage, 'view' event_type, COUNT(*) n_users FROM s1
        |UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3""".stripMargin,
    "q99_retention" ->
      """WITH a AS (SELECT DISTINCT user_id u,
        |    CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
        |      AS BIGINT) widx FROM events),
        |f AS (SELECT u, MIN(widx) cohort FROM a GROUP BY 1)
        |SELECT cohort, widx - cohort k, COUNT(*) n_users
        |FROM a JOIN f USING (u) GROUP BY 1, 2""".stripMargin,
    "q113_avro_roundtrip" ->
      """SELECT o_orderpriority,
        |  COUNT(*) n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) sum_keys,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) * 100 AS BIGINT)
        |    AS DOUBLE) / 100 sum_price,
        |  MIN(o_orderdate) first_dt, MAX(o_orderdate) last_dt
        |FROM orders WHERE o_orderkey % 20 = 0
        |GROUP BY 1""".stripMargin,
    "q95_scd2" -> scd2OracleSql,
    // incremental merge provably equals the full rebuild: same oracle
    "q101_scd2_merge" -> scd2OracleSql,
    "q92_rolling_spikes" ->
      """WITH o AS (SELECT o_orderdate FROM orders
        |    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'),
        |u AS (SELECT o_orderdate, unnest(generate_series(1,
        |    CASE WHEN o_orderdate = DATE '1995-02-15' THEN 4 ELSE 1 END)) _rep FROM o),
        |base AS (SELECT o_orderdate "day", COUNT(*) cnt FROM u GROUP BY 1),
        |w AS (SELECT "day", cnt,
        |    CAST(SUM(cnt) OVER (ORDER BY "day" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) sum_w,
        |    COUNT(*) OVER (ORDER BY "day" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) n_w
        |  FROM base)
        |SELECT "day", cnt, sum_w, n_w, cnt * n_w > 2 * sum_w spike FROM w""".stripMargin,
    "q67_resample" ->
      """WITH days AS (SELECT CAST(unnest(generate_series(
        |    DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) "day"),
        |c AS (SELECT CAST(o_orderdate AS DATE) "day", COUNT(*) n FROM orders
        |      WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
        |      GROUP BY 1)
        |SELECT days."day", COALESCE(c.n, 0) n
        |FROM days LEFT JOIN c USING ("day")""".stripMargin,
    "q66_heavy_hitters" ->
      """WITH tok AS (SELECT
        |    unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) token
        |  FROM documents)
        |SELECT token, COUNT(*) exact_cnt, TRUE present_ok, TRUE bound_ok
        |FROM tok GROUP BY token
        |ORDER BY exact_cnt DESC, token ASC LIMIT 10""".stripMargin,
    "q65_grouping_sets" -> ops.Sql.groupingSets,
    "q63_unpivot" -> Seq("quantity", "extendedprice", "discount", "tax").map(m =>
      s"""SELECT l_orderkey, l_linenumber, '$m' metric,
         |  CAST(l_$m AS DOUBLE) v FROM lineitem""".stripMargin)
      .mkString("\nUNION ALL\n")
  )
}
