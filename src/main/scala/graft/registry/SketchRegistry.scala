package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{CountMin, Gk, Kmv, Quality, Relational}

/** Sketch/approximation domain registry (round-15 split tranche 4):
  * the bounded-summary family — HLL++ distinct (q43), GK quantiles
  * (q45/q163/q175), count-min heavy hitters (q90), the KMV/theta
  * sketch suite (q154-q156, q161/q162/q164) and the drift monitors
  * built on them (q166/q172/q174) — each query above its DuckDB
  * oracle. Sketch values are engine-specific data elements, so every
  * oracle pins exact answers plus TRUE bound-certificates (the
  * q43/q45/q66 discipline). Bodies and SQL moved verbatim; the oracle
  * gate re-ran on the split — byte-identical results. */
private[graft] object SketchRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HLL++ sketch certification (round-3): exact counts + within-3*rsd
    // booleans — the sketch value itself is engine-specific, its error
    // bound is not. Production-scale form stays approxDistinctCounts.
    "q43_approx_distinct" -> ((s, d) =>
      Relational.approxDistinctCertified(Tables.lineitem(s, d))),
    // GK-sketch quantile certification: exact values + rank-bound booleans
    // (same discipline as q43). Production-scale form is the bare
    // approx_percentile aggregate; this query proves its error bound.
    "q45_approx_quantiles" -> ((s, d) =>
      Relational.approxQuantilesCertified(Tables.lineitem(s, d))),
    // count-min sketch frequency certification: exact top-10 suppkeys +
    // order-independent sketch bounds as booleans (same certification
    // discipline as q43/q45/q66 — the raw counters are seed-specific,
    // the bounds are not)
    "q90_count_min" -> ((s, d) =>
      CountMin.certifiedCounts(Tables.lineitem(s, d), "l_suppkey", k = 10)),
    // KMV distinct sketch (Kmv.certifiedEstimate, Bar-Yossef '02): the
    // deterministic cardinality estimator q43's HLL cannot be — sketch
    // state is "the 256 smallest 48-bit md5 hashes", a pure function of
    // the input set, so the oracle replays the sketch AND the estimate
    // bit-for-bit (hex→int positional fold in DuckDB). Mergeable typed
    // Aggregator: each partition reduces to ≤ k longs, map-side merge
    "q154_kmv_distinct" -> ((s, d) =>
      Kmv.certifiedEstimate(Tables.events(s, d), "event_id", k = 256)),
    // grouped KMV (Kmv.groupedCertifiedEstimate): distinct users per
    // event type through the keyed sketch — each task reduces every
    // group to <= k longs and partials merge map-side, so the shuffle
    // never carries user ids; the oracle replays the per-group k-minima
    // via ROW_NUMBER and the same integer estimate formula
    "q155_kmv_grouped" -> ((s, d) =>
      Kmv.groupedCertifiedEstimate(Tables.events(s, d),
        "event_type", "user_id", k = 32)),
    // theta-style set-operation cardinality (Kmv.setEstimates,
    // DataSketches/Dasgupta '16): union AND intersection distinct
    // counts of two event populations from their 128-long sketches
    // alone — θ = min(θ_A, θ_B), intersection = common-below-θ scaled
    // by 2^48/θ, uniform down to the exact under-full degenerate; the
    // oracle replays k-minima, θ, INTERSECT, and both integer formulas
    "q156_kmv_setops" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Kmv.setEstimates(
        ev.where(col("event_type") === "click"), "event_id",
        ev.where(col("value") >= 30.0), "event_id", k = 128)
    }),
    // windowed distinct cardinality (composition: the q155 grouped
    // sketch over event-TIME windows — "distinct users per day" as a
    // resident-dashboard query whose shuffle carries <= k longs per
    // day, never user ids; daily truncation via to_date so the group
    // key strings match cross-engine)
    "q161_kmv_windowed" -> ((s, d) =>
      Kmv.groupedCertifiedEstimate(
        Tables.events(s, d)
          .withColumn("day", to_date(col("ts")).cast("string")),
        "day", "user_id", k = 16)),
    // 3-way KMV intersection (Kmv.multiIntersection): the q156 θ rule
    // over three event populations — θ = min of the three thresholds,
    // candidates = hashes in ALL sketches below θ, scaled by 2^48/θ;
    // the oracle replays three k-minima CTEs, LEAST, chained INTERSECT,
    // and both formulas
    "q162_kmv_inter3" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Kmv.multiIntersection(Seq(
        (ev.where(col("value") >= 10.0), "event_id"),
        (ev.where(col("value") >= 30.0), "event_id"),
        (ev.where(col("event_type") === "click"), "event_id")), k = 128)
    }),
    // per-group GK quantiles (Gk.groupedQuantilesCertified, Greenwald-
    // Khanna '01 / Agarwal '12 mergeable form): per-SOURCE rank-error-
    // bounded quantiles of document length from a keyed mergeable
    // summary Aggregator — the drift-monitoring primitive (per-source
    // quantile edges are the fixed buckets q89's TVD compares). The
    // sketch value is an engine-specific data element, so the oracle
    // pins the exact per-source quantiles plus TRUE rank-bound
    // certificates (the q45/q43/q66 discipline)
    "q163_grouped_gk" -> ((s, d) =>
      Gk.groupedQuantilesCertified(Tables.documents(s, d),
        "source", "n_chars")),
    // KMV source-overlap matrix (Kmv.sourceOverlapSketch): q158's
    // mixture-planning report at SKETCH volume — per-source shingle
    // sets reduced to k-long KMV sketches, every pairwise overlap read
    // from the sketches via the q156 θ rule; deterministic k-minima, so
    // the oracle replays the sketch VALUES, θ, n_common, the integer
    // estimate, and the exact certification counts on the q158 slice
    "q164_kmv_overlap" -> ((s, d) =>
      Kmv.sourceOverlapSketch(
        Tables.documents(s, d).where(col("doc_id") < 300), k = 256)),
    // per-source quantile-bucket drift (Quality.quantileDrift): the q89
    // TVD over GLOBAL quartile edges of document length — quantile
    // buckets stay calibrated as distributions move (the q163 GK
    // sketch's production use); ppm-quantized fractions FIRST (the
    // tCloseness fixed-point rule, overflow-free at any corpus size);
    // the oracle replays edges, buckets, the dense grid, and the
    // integer TVD
    "q166_quantile_drift" -> ((s, d) =>
      Quality.quantileDrift(Tables.documents(s, d), "source", "n_chars")),
    // CALIBRATED drift (Quality.quantileDriftWithEdges): the q166
    // report against FIXED edges (fit once, applied unchanged — the
    // monitoring form StreamDrift runs per batch); literal edges
    // 200/300/400 sit inside the doc-length distribution so every
    // bucket is populated; the oracle replays the constant-edge
    // buckets, the dense grid, and the integer TVD
    "q172_calibrated_drift" -> ((s, d) =>
      Quality.quantileDriftWithEdges(Tables.documents(s, d),
        "source", "n_chars", edges = Seq(200.0, 300.0, 400.0))),
    // sketch-edge drift CERTIFICATE (Quality.quantileDriftSketchCertified):
    // the q166 exact report plus an in-plan bound check that the GK-edge
    // twin (quantileDriftSketch, the 100 TB production path whose edges
    // never cross engines) landed within the rank-bound's TVD envelope —
    // E·(min(εN, n_s)/n_s + ε) per source, doubled slack; the oracle
    // replays the exact report and pins ok TRUE (the q45/q163 discipline)
    "q174_drift_sketch_cert" -> ((s, d) =>
      Quality.quantileDriftSketchCertified(Tables.documents(s, d),
        "source", "n_chars")),
    // per-(source, day) windowed GK quantiles (Gk.
    // groupedQuantilesCertifiedByRank): q163's keyed sketch composed
    // with q161's event-time axis — the drift dashboard's real
    // dimension, one bounded summary per (event_type, day) cell; small
    // windows make the interpolated value-window certificate fragile,
    // so `ok` counts the sketch answer's TRUE rank interval against
    // r ± (2εn+2) exactly; NULL-propagating concat key (concat_ws
    // would silently drop a NULL day — engine-divergent)
    "q175_gk_windowed" -> ((s, d) =>
      Gk.groupedQuantilesCertifiedByRank(
        Tables.events(s, d).withColumn("src_day",
          concat(col("event_type"), lit("|"),
            to_date(col("ts")).cast("string"))),
        "src_day", "value")))

  val oracleSql: Map[String, String] = Map(
    "q43_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) n_parts_exact,
        |  COUNT(DISTINCT l_suppkey) n_supps_exact, COUNT(*) n_rows,
        |  TRUE parts_ok, TRUE supps_ok
        |FROM lineitem""".stripMargin,
    "q45_approx_quantiles" -> Seq(0.25, 0.5, 0.75, 0.95).map(p =>
      s"""SELECT l_returnflag, CAST($p AS DOUBLE) p,
         |  FLOOR(quantile_cont(l_extendedprice, $p) * 100 + 0.5) / 100.0 q,
         |  TRUE ok
         |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q90_count_min" ->
      """SELECT l_suppkey "key", COUNT(*) exact_cnt, TRUE lb_ok, TRUE ub_ok
        |FROM lineitem GROUP BY 1
        |ORDER BY exact_cnt DESC, "key" ASC LIMIT 10""".stripMargin,
    "q154_kmv_distinct" ->
      """WITH hashed AS (
        |  SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE event_id IS NOT NULL),
        |hv AS (
        |  SELECT DISTINCT CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hashed CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |sel AS (SELECT v FROM hv ORDER BY v LIMIT 256),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) n_kept,
        |               CAST(MAX(v) AS BIGINT) kth_hash FROM sel),
        |ex AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT)
        |         exact_distinct
        |       FROM events WHERE event_id IS NOT NULL)
        |SELECT n_kept, kth_hash,
        |       CAST(CASE WHEN n_kept < 256 THEN n_kept
        |            ELSE (255 * 281474976710656) // (kth_hash + 1)
        |            END AS BIGINT) est_distinct,
        |       exact_distinct
        |FROM agg CROSS JOIN ex""".stripMargin,
    "q155_kmv_grouped" ->
      """WITH hashed AS (
        |  SELECT DISTINCT event_type g, md5(CAST(user_id AS VARCHAR)) h
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |hv AS (
        |  SELECT DISTINCT g, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hashed CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY g, h),
        |sel AS (SELECT g, v FROM (
        |    SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) rn
        |    FROM hv) WHERE rn <= 32),
        |agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_kept,
        |               CAST(MAX(v) AS BIGINT) kth_hash
        |        FROM sel GROUP BY g),
        |ex AS (SELECT event_type g,
        |              CAST(COUNT(DISTINCT user_id) AS BIGINT) exact_distinct
        |       FROM events
        |       WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |       GROUP BY 1)
        |SELECT agg.g event_type, n_kept, kth_hash,
        |       CAST(CASE WHEN n_kept < 32 THEN n_kept
        |            ELSE (31 * 281474976710656) // (kth_hash + 1)
        |            END AS BIGINT) est_distinct,
        |       exact_distinct
        |FROM agg JOIN ex ON agg.g = ex.g""".stripMargin,
    "q156_kmv_setops" ->
      """WITH ha AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE event_type = 'click' AND event_id IS NOT NULL),
        |va AS (SELECT DISTINCT CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM ha CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |sa AS (SELECT v FROM va ORDER BY v LIMIT 128),
        |hb AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE value >= 30.0 AND event_id IS NOT NULL),
        |vb AS (SELECT DISTINCT CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hb CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |sb AS (SELECT v FROM vb ORDER BY v LIMIT 128),
        |ta AS (SELECT CAST(COUNT(*) AS BIGINT) n_a,
        |         CAST(CASE WHEN COUNT(*) < 128 THEN 281474976710656
        |              ELSE MAX(v) + 1 END AS BIGINT) theta_a FROM sa),
        |tb AS (SELECT CAST(COUNT(*) AS BIGINT) n_b,
        |         CAST(CASE WHEN COUNT(*) < 128 THEN 281474976710656
        |              ELSE MAX(v) + 1 END AS BIGINT) theta_b FROM sb),
        |th AS (SELECT n_a, n_b,
        |         CAST(LEAST(theta_a, theta_b) AS BIGINT) theta
        |       FROM ta CROSS JOIN tb),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) n_common
        |       FROM (SELECT v FROM sa INTERSECT SELECT v FROM sb) c
        |       CROSS JOIN th WHERE c.v < th.theta),
        |un AS (SELECT v FROM (SELECT v FROM sa UNION SELECT v FROM sb) u
        |       ORDER BY v LIMIT 128),
        |ue AS (SELECT CAST(COUNT(*) AS BIGINT) n_u,
        |              CAST(MAX(v) AS BIGINT) h_u FROM un),
        |exu AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) exact_union
        |        FROM events WHERE event_id IS NOT NULL
        |          AND (event_type = 'click' OR value >= 30.0)),
        |exi AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) exact_inter
        |        FROM events WHERE event_id IS NOT NULL
        |          AND event_type = 'click' AND value >= 30.0)
        |SELECT n_a, n_b, theta,
        |       CAST((n_common * 281474976710656) // theta AS BIGINT)
        |         est_inter,
        |       CAST(CASE WHEN n_u < 128 THEN n_u
        |            ELSE (127 * 281474976710656) // (h_u + 1)
        |            END AS BIGINT) est_union,
        |       exact_union, exact_inter
        |FROM th CROSS JOIN nc CROSS JOIN ue
        |CROSS JOIN exu CROSS JOIN exi""".stripMargin,
    "q161_kmv_windowed" ->
      """WITH hashed AS (
        |  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) g,
        |         md5(CAST(user_id AS VARCHAR)) h
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |hv AS (
        |  SELECT DISTINCT g, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hashed CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY g, h),
        |sel AS (SELECT g, v FROM (
        |    SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) rn
        |    FROM hv) WHERE rn <= 16),
        |agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_kept,
        |               CAST(MAX(v) AS BIGINT) kth_hash
        |        FROM sel GROUP BY g),
        |ex AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) g,
        |              CAST(COUNT(DISTINCT user_id) AS BIGINT) exact_distinct
        |       FROM events
        |       WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |       GROUP BY 1)
        |SELECT agg.g "day", n_kept, kth_hash,
        |       CAST(CASE WHEN n_kept < 16 THEN n_kept
        |            ELSE (15 * 281474976710656) // (kth_hash + 1)
        |            END AS BIGINT) est_distinct,
        |       exact_distinct
        |FROM agg JOIN ex ON agg.g = ex.g""".stripMargin,
    "q162_kmv_inter3" ->
      """WITH h0 AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE value >= 10.0 AND event_id IS NOT NULL),
        |v0 AS (SELECT DISTINCT CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM h0 CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |s0 AS (SELECT v FROM v0 ORDER BY v LIMIT 128),
        |h1 AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE value >= 30.0 AND event_id IS NOT NULL),
        |v1 AS (SELECT DISTINCT CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM h1 CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |s1 AS (SELECT v FROM v1 ORDER BY v LIMIT 128),
        |h2 AS (SELECT DISTINCT md5(CAST(event_id AS VARCHAR)) h
        |  FROM events WHERE event_type = 'click' AND event_id IS NOT NULL),
        |v2 AS (SELECT DISTINCT CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM h2 CROSS JOIN generate_series(1, 12) t(i) GROUP BY h),
        |s2 AS (SELECT v FROM v2 ORDER BY v LIMIT 128),
        |t0 AS (SELECT CAST(COUNT(*) AS BIGINT) n_0,
        |         CAST(CASE WHEN COUNT(*) < 128 THEN 281474976710656
        |              ELSE MAX(v) + 1 END AS BIGINT) th0 FROM s0),
        |t1 AS (SELECT CAST(COUNT(*) AS BIGINT) n_1,
        |         CAST(CASE WHEN COUNT(*) < 128 THEN 281474976710656
        |              ELSE MAX(v) + 1 END AS BIGINT) th1 FROM s1),
        |t2 AS (SELECT CAST(COUNT(*) AS BIGINT) n_2,
        |         CAST(CASE WHEN COUNT(*) < 128 THEN 281474976710656
        |              ELSE MAX(v) + 1 END AS BIGINT) th2 FROM s2),
        |th AS (SELECT n_0, n_1, n_2,
        |         CAST(LEAST(th0, th1, th2) AS BIGINT) theta
        |       FROM t0 CROSS JOIN t1 CROSS JOIN t2),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) n_common
        |       FROM (SELECT v FROM s0 INTERSECT
        |             SELECT v FROM s1 INTERSECT
        |             SELECT v FROM s2) c
        |       CROSS JOIN th WHERE c.v < th.theta),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) exact_inter FROM (
        |    SELECT DISTINCT event_id FROM events
        |      WHERE value >= 10.0 AND event_id IS NOT NULL
        |    INTERSECT
        |    SELECT DISTINCT event_id FROM events
        |      WHERE value >= 30.0 AND event_id IS NOT NULL
        |    INTERSECT
        |    SELECT DISTINCT event_id FROM events
        |      WHERE event_type = 'click' AND event_id IS NOT NULL))
        |SELECT n_0, n_1, n_2, theta, n_common,
        |       CAST((n_common * 281474976710656) // theta AS BIGINT)
        |         est_inter,
        |       exact_inter
        |FROM th CROSS JOIN nc CROSS JOIN ex""".stripMargin,
    "q163_grouped_gk" -> Seq(0.25, 0.5, 0.75, 0.95).map(p =>
      s"""SELECT CAST(source AS VARCHAR) source, CAST($p AS DOUBLE) p,
         |  FLOOR(quantile_cont(CAST(n_chars AS DOUBLE), $p) * 100 + 0.5)
         |    / 100.0 q,
         |  TRUE ok
         |FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
         |GROUP BY source""".stripMargin)
      .mkString("\nUNION ALL\n"),
    "q164_kmv_overlap" ->
      """WITH docs AS (SELECT * FROM documents WHERE doc_id < 300),
        |t AS (SELECT source,
        |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |         ELSE list_transform(range(1, len(tk)),
        |           i -> tk[i] || ' ' || tk[i+1]) END sh
        |  FROM (SELECT source,
        |        list_filter(regexp_split_to_array(lower(text), '\s+'),
        |          x -> x <> '') tk
        |        FROM docs WHERE text IS NOT NULL AND source IS NOT NULL)),
        |ds AS (SELECT DISTINCT CAST(source AS VARCHAR) g, unnest(sh) s
        |       FROM t),
        |hx AS (SELECT DISTINCT g, md5(s) h FROM ds),
        |sv AS (SELECT DISTINCT g, CAST(SUM(
        |    (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |    * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hx CROSS JOIN generate_series(1, 12) gs(i) GROUP BY g, h),
        |sk AS (SELECT g, v FROM (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v) rn FROM sv)
        |  WHERE rn <= 256),
        |th AS (SELECT g, CAST(COUNT(*) AS BIGINT) n_kept,
        |    CASE WHEN COUNT(*) < 256 THEN 281474976710656
        |         ELSE MAX(v) + 1 END theta
        |  FROM sk GROUP BY g),
        |pr AS (SELECT a.g source_a, b.g source_b, a.n_kept kept_a,
        |        b.n_kept kept_b,
        |        CAST(LEAST(a.theta, b.theta) AS BIGINT) theta
        |       FROM th a JOIN th b ON a.g < b.g),
        |cm AS (SELECT x.g source_a, y.g source_b,
        |        CAST(COUNT(*) AS BIGINT) n_common
        |       FROM sk x JOIN sk y ON x.v = y.v AND x.g < y.g
        |         JOIN pr ON pr.source_a = x.g AND pr.source_b = y.g
        |       WHERE x.v < pr.theta GROUP BY 1, 2),
        |ep AS (SELECT g, CAST(COUNT(*) AS BIGINT) exact_n FROM ds
        |       GROUP BY g),
        |ei AS (SELECT x.g source_a, y.g source_b,
        |        CAST(COUNT(*) AS BIGINT) exact_inter
        |       FROM ds x JOIN ds y ON x.s = y.s AND x.g < y.g
        |       GROUP BY 1, 2)
        |SELECT pr.source_a, pr.source_b, pr.kept_a, pr.kept_b, pr.theta,
        |  CAST(COALESCE(cm.n_common, 0) AS BIGINT) n_common,
        |  CAST((COALESCE(cm.n_common, 0) * 281474976710656) // pr.theta
        |    AS BIGINT) est_inter,
        |  ea.exact_n exact_a, eb.exact_n exact_b,
        |  CAST(COALESCE(ei.exact_inter, 0) AS BIGINT) exact_inter
        |FROM pr LEFT JOIN cm USING (source_a, source_b)
        |  JOIN ep ea ON ea.g = pr.source_a
        |  JOIN ep eb ON eb.g = pr.source_b
        |  LEFT JOIN ei USING (source_a, source_b)""".stripMargin,
    "q166_quantile_drift" ->
      """WITH base AS (SELECT CAST(source AS VARCHAR) g,
        |    CAST(n_chars AS DOUBLE) x
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |e AS (SELECT quantile_cont(x, 0.25) e1, quantile_cont(x, 0.5) e2,
        |    quantile_cont(x, 0.75) e3 FROM base),
        |b AS (SELECT g,
        |    (CASE WHEN x > e1 THEN 1 ELSE 0 END
        |   + CASE WHEN x > e2 THEN 1 ELSE 0 END
        |   + CASE WHEN x > e3 THEN 1 ELSE 0 END) bucket
        |  FROM base CROSS JOIN e),
        |sb AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) cnt
        |       FROM b GROUP BY 1, 2),
        |gb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) cnt_g
        |       FROM sb GROUP BY 1),
        |ns AS (SELECT g, CAST(SUM(cnt) AS BIGINT) n_s FROM sb GROUP BY 1),
        |ng AS (SELECT CAST(SUM(cnt_g) AS BIGINT) n_g FROM gb),
        |grid AS (SELECT ns.g, ns.n_s, gb.bucket, gb.cnt_g,
        |    CAST(COALESCE(sb.cnt, 0) AS BIGINT) cnt
        |  FROM ns CROSS JOIN gb
        |  LEFT JOIN sb ON sb.g = ns.g AND sb.bucket = gb.bucket),
        |d AS (SELECT g, n_s, CAST(SUM(ABS(
        |    (1000000 * cnt) // n_s - (1000000 * cnt_g) // n_g))
        |    AS BIGINT) s
        |  FROM grid CROSS JOIN ng GROUP BY 1, 2)
        |SELECT g source, n_s n_rows, CAST(s // 2 AS BIGINT) tvd_ppm,
        |  s // 2 >= 100000 drifted
        |FROM d""".stripMargin,
    "q172_calibrated_drift" ->
      """WITH base AS (SELECT CAST(source AS VARCHAR) g,
        |    CAST(n_chars AS DOUBLE) x
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |b AS (SELECT g,
        |    (CASE WHEN x > 200.0 THEN 1 ELSE 0 END
        |   + CASE WHEN x > 300.0 THEN 1 ELSE 0 END
        |   + CASE WHEN x > 400.0 THEN 1 ELSE 0 END) bucket
        |  FROM base),
        |sb AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) cnt
        |       FROM b GROUP BY 1, 2),
        |gb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) cnt_g
        |       FROM sb GROUP BY 1),
        |ns AS (SELECT g, CAST(SUM(cnt) AS BIGINT) n_s FROM sb GROUP BY 1),
        |ng AS (SELECT CAST(SUM(cnt_g) AS BIGINT) n_g FROM gb),
        |grid AS (SELECT ns.g, ns.n_s, gb.bucket, gb.cnt_g,
        |    CAST(COALESCE(sb.cnt, 0) AS BIGINT) cnt
        |  FROM ns CROSS JOIN gb
        |  LEFT JOIN sb ON sb.g = ns.g AND sb.bucket = gb.bucket),
        |d AS (SELECT g, n_s, CAST(SUM(ABS(
        |    (1000000 * cnt) // n_s - (1000000 * cnt_g) // n_g))
        |    AS BIGINT) s
        |  FROM grid CROSS JOIN ng GROUP BY 1, 2)
        |SELECT g source, n_s n_rows, CAST(s // 2 AS BIGINT) tvd_ppm,
        |  s // 2 >= 100000 drifted
        |FROM d""".stripMargin,
    "q174_drift_sketch_cert" ->
      """WITH base AS (SELECT CAST(source AS VARCHAR) g,
        |    CAST(n_chars AS DOUBLE) x
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |e AS (SELECT quantile_cont(x, 0.25) e1, quantile_cont(x, 0.5) e2,
        |    quantile_cont(x, 0.75) e3 FROM base),
        |b AS (SELECT g,
        |    (CASE WHEN x > e1 THEN 1 ELSE 0 END
        |   + CASE WHEN x > e2 THEN 1 ELSE 0 END
        |   + CASE WHEN x > e3 THEN 1 ELSE 0 END) bucket
        |  FROM base CROSS JOIN e),
        |sb AS (SELECT g, bucket, CAST(COUNT(*) AS BIGINT) cnt
        |       FROM b GROUP BY 1, 2),
        |gb AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) cnt_g
        |       FROM sb GROUP BY 1),
        |ns AS (SELECT g, CAST(SUM(cnt) AS BIGINT) n_s FROM sb GROUP BY 1),
        |ng AS (SELECT CAST(SUM(cnt_g) AS BIGINT) n_g FROM gb),
        |grid AS (SELECT ns.g, ns.n_s, gb.bucket, gb.cnt_g,
        |    CAST(COALESCE(sb.cnt, 0) AS BIGINT) cnt
        |  FROM ns CROSS JOIN gb
        |  LEFT JOIN sb ON sb.g = ns.g AND sb.bucket = gb.bucket),
        |d AS (SELECT g, n_s, CAST(SUM(ABS(
        |    (1000000 * cnt) // n_s - (1000000 * cnt_g) // n_g))
        |    AS BIGINT) s
        |  FROM grid CROSS JOIN ng GROUP BY 1, 2)
        |SELECT g source, n_s n_rows, CAST(s // 2 AS BIGINT) tvd_ppm,
        |  s // 2 >= 100000 drifted, TRUE ok
        |FROM d""".stripMargin,
    "q175_gk_windowed" -> Seq(0.25, 0.5, 0.75, 0.95).zipWithIndex.map {
      case (p, i) =>
        s"""SELECT event_type || '|' || CAST(CAST(ts AS DATE) AS VARCHAR)
           |    src_day,
           |  CAST($i AS BIGINT) pos,
           |  CAST($p AS DOUBLE) p,
           |  FLOOR(quantile_cont(CAST(value AS DOUBLE), $p) * 100 + 0.5)
           |    / 100.0 q,
           |  TRUE ok
           |FROM events
           |WHERE value IS NOT NULL AND event_type IS NOT NULL
           |  AND ts IS NOT NULL
           |GROUP BY 1""".stripMargin
    }.mkString("\nUNION ALL\n"))
}
