package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality expectation checks and snapshot diffing — the guardrails a
  * production pipeline runs before publishing a table version.
  *
  * Checks are expressed as plain aggregations/joins so they scale like any
  * other query (one scan per frame; the FK check is an equi-join the
  * optimizer can broadcast). Output is one row per check with a violation
  * count — 0 means the expectation holds — so the result is tiny no
  * matter the input size and can gate a publish step cheaply.
  */
object Quality {

  /** Uniqueness violations: rows beyond the first per key. */
  def uniquenessViolations(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(coalesce(sum(col("_n") - 1), lit(0L)).cast("long").as("violations"))

  /** Referential-integrity violations: child keys absent from the parent
    * (left anti join — broadcastable when the parent key set fits). */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("_k")).where(col("_k").isNotNull)
      .join(parent.select(col(parentKey).as("_k")), Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("violations"))

  /** Null-rate violation count for a column. */
  def nullViolations(df: DataFrame, c: String): DataFrame =
    df.agg(count(when(col(c).isNull, lit(1))).as("violations"))

  /** Domain violations: values outside the accepted set (NULL passes —
    * pair with [[nullViolations]] when NULL is also unacceptable). */
  def domainViolations(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.agg(count(when(col(c).isNotNull && !col(c).isInCollection(accepted), lit(1)))
      .as("violations"))

  /** Single-pass check battery over one child table: pk-uniqueness,
    * FK-into-parent, and null-rate computed from ONE scan. The per-check
    * functions above each scan their input; a battery of three orders
    * checks built from them reads orders three times — at 100 TB every
    * redundant scan is real money. Shape: left-join the child's FK column
    * against the (deduplicated) parent key set, then a pk-keyed
    * aggregation carrying three partial counters at once — group size,
    * per-group nulls, per-group FK misses — and a scalar roll-up that
    * explodes into one (check, violations) row per expectation. Two
    * aggregation levels = map-side combine on the pk; the parent side
    * broadcasts when small. Output rows match the per-check functions
    * exactly, so this is a drop-in fusion, not a semantic change. */
  def childBattery(child: DataFrame, pkCol: String, fkCol: String,
                   nullCol: String, parent: DataFrame, parentKey: String,
                   pkName: String, fkName: String, nullName: String): DataFrame = {
    val pkeys = parent.select(col(parentKey).as("_pk")).distinct()
      .withColumn("_hit", lit(1))
    child
      .select(col(pkCol).as("_id"), col(fkCol).as("_fk"), col(nullCol).as("_nc"))
      .join(pkeys, col("_fk") === col("_pk"), "left")
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("_n"),
        count(when(col("_nc").isNull, lit(1))).as("_nnull"),
        count(when(col("_fk").isNotNull && col("_hit").isNull, lit(1))).as("_nfk"))
      .agg(
        coalesce(sum(col("_n") - 1), lit(0L)).cast("long").as("_pkv"),
        coalesce(sum(col("_nfk")), lit(0L)).cast("long").as("_fkv"),
        coalesce(sum(col("_nnull")), lit(0L)).cast("long").as("_nullv"))
      .select(explode(array(
        struct(lit(pkName).as("check"), col("_pkv").as("violations")),
        struct(lit(fkName).as("check"), col("_fkv").as("violations")),
        struct(lit(nullName).as("check"), col("_nullv").as("violations")))).as("_r"))
      .select(col("_r.check").as("check"), col("_r.violations").as("violations"))
  }

  /** Snapshot diff: row-level changes from `before` to `after`, keyed by
    * `keyCol`, comparing `valueCols`. One full-outer equi-join on the key;
    * change ∈ {added, removed, changed}. Unchanged rows are dropped, so
    * the output is proportional to churn, not table size — the shape that
    * makes daily 100 TB snapshot audits affordable. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCol: String, valueCols: Seq[String]): DataFrame = {
    val b = before.select(col(keyCol).as("_k"),
      struct(valueCols.map(col): _*).as("_vb"))
    val a = after.select(col(keyCol).as("_k"),
      struct(valueCols.map(col): _*).as("_va"))
    b.join(a, Seq("_k"), "full_outer")
      .withColumn("change",
        when(col("_vb").isNull, "added")
          .when(col("_va").isNull, "removed")
          .when(col("_vb") =!= col("_va"), "changed"))
      .where(col("change").isNotNull)
      .select(col("_k").as(keyCol), col("change"))
  }

  /** Rolling spike detection over an event-per-row table: flag days whose
    * volume exceeds `factor`× the trailing `window`-day average — the
    * monitor a pipeline runs on ingest volume before trusting a crawl cut
    * (a 4× day usually means a duplicated feed, not 4× more internet).
    *
    * Shape: aggregate FIRST (per-day counts — the only shuffle over data,
    * with map-side combine), then a ROWS-frame window over the tiny daily
    * series. The global orderBy window funnels through one partition by
    * construction, but only #days rows ever reach it — at 100 TB that is
    * still a few thousand rows. The flag compares integers only
    * (cnt·n_w > factor·sum_w  ⇔  cnt > factor·avg_w), so the output is
    * bit-identical in any engine; no float average is ever formed. */
  def rollingSpikes(df: DataFrame, dayCol: String, factor: Int = 2,
                    window: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(factor > 0 && window > 0, "factor and window must be positive")
    val w = Window.orderBy(col("day")).rowsBetween(-(window - 1), 0)
    df.groupBy(col(dayCol).as("day")).agg(count(lit(1)).as("cnt"))
      .select(col("day"), col("cnt"),
        sum(col("cnt")).over(w).as("sum_w"),
        count(lit(1)).over(w).as("n_w"))
      .withColumn("spike", col("cnt") * col("n_w") > lit(factor) * col("sum_w"))
  }

  /** Distribution drift between two snapshots of a numeric column — the
    * check a training pipeline runs between crawl cuts before mixing them
    * ("did the length/price/score distribution move?"). Each side is
    * bucketed by the caller-supplied expression, reduced to per-bucket
    * counts (one agg per side — the only shuffles, each over ≤ #buckets
    * rows after map-side combine), then the tiny count frames full-outer
    * join and every drift figure derives from INTEGER-EXACT cross
    * products: |cntB·totalA − cntA·totalB| never touches a float until
    * the final division, so the emitted total-variation distance is
    * bit-identical in any engine. (The usual PSI needs ln() — libm output
    * is not reproducible across engines, and at these row counts TVD
    * ranks drift the same way.) Long headroom: cnt·total < 2⁶³ holds to
    * ~3e9 rows per side; shard the drift check per source beyond that.
    *
    * Output: one row per bucket with both counts, the bucket's integer
    * drift numerator, and the global `tvd` = Σnum / (2·totalB·totalA)
    * repeated on each row (windows over the ≤ #buckets frame). */
  def distributionDrift(before: DataFrame, after: DataFrame,
                        bucketOf: DataFrame => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = before.groupBy(bucketOf(before).as("bucket"))
      .agg(count(lit(1)).as("cnt_before"))
    val ca = after.groupBy(bucketOf(after).as("bucket"))
      .agg(count(lit(1)).as("cnt_after"))
    val wAll = Window.partitionBy()
    cb.join(ca, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_before"), lit(0L)).as("cnt_before"),
        coalesce(col("cnt_after"), lit(0L)).as("cnt_after"))
      .withColumn("_tb", sum(col("cnt_before")).over(wAll))
      .withColumn("_ta", sum(col("cnt_after")).over(wAll))
      .withColumn("drift_num",
        abs(col("cnt_before") * col("_ta") - col("cnt_after") * col("_tb")))
      .withColumn("tvd",
        sum(col("drift_num")).over(wAll).cast("double") /
          (lit(2.0) * col("_tb") * col("_ta")))
      .select(col("bucket"), col("cnt_before"), col("cnt_after"),
        col("drift_num"), col("tvd"))
  }

  /** Per-GROUP drift against the corpus distribution over QUANTILE
    * buckets — the q89 TVD with the bucket problem solved: fixed-width
    * buckets drift out of calibration as the value distribution moves,
    * while quantile edges (here the global quartiles by default) always
    * split the corpus into comparably-sized cells, which is what makes
    * per-source TVDs comparable ACROSS sources. This is the report the
    * per-source GK sketch (q163) feeds at scale: production derives the
    * edges from `Gk.groupedQuantiles` in one sketch pass; this
    * certified form uses the exact in-plan percentile so the oracle
    * replays the edges bit-for-bit (identical IEEE interpolation, and a
    * boundary strictly between adjacent order statistics has no data
    * between the two engines' versions of it — the q45/exactQuantiles
    * argument).
    *
    * Exact fixed-point discipline (the tCloseness rule): per-cell
    * fractions are quantized to ppm FIRST (`(1e6·cnt) div n`, positive
    * operands so trunc == floor in both engines), then differenced —
    * every intermediate stays ≤ 2e6·buckets regardless of corpus size
    * (no cnt·N cross-products that overflow at 100 TB row counts), and
    * `tvd_ppm = Σ|p_s − p_g| div 2` is the metric's contract.
    *
    * Shape at scale: one scan buckets rows against a 1-row broadcast
    * edge aggregate (comparisons unrolled per edge — no interpreted
    * HOF), one map-side-combined groupBy on (group, bucket); everything
    * after is audit-bounded (groups × buckets). */
  def quantileDrift(df: DataFrame, groupCol: String, valueCol: String,
                    ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
                    driftPpm: Long = 100000L): DataFrame = {
    val base = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("x"))
    val edges = base.agg(
      percentile(col("x"), array(ps.map(lit): _*)).as("es"))
    driftFromEdges(base, edges, ps.length, driftPpm, groupCol)
  }

  /** [[quantileDrift]] with SKETCH-derived edges — the production form
    * at 100 TB: the global quantile edges come from one pass of the
    * mergeable GK summary ([[Gk.GkAgg]], values never shuffle) instead
    * of the exact `percentile` aggregate, whose final merge buffers
    * every distinct value on one task (the q86/exactQuantiles OOM
    * argument). Each edge sits within ε·N ranks of the exact one, so
    * per-bucket counts shift by at most ε·N each and the TVD by at most
    * 2·buckets·ε — with the default ε=0.005 that is ±3% absolute on a
    * metric thresholded at 10%, and the spec pins exact agreement when
    * no data falls inside the rank-wiggle window. Not oracle-expressible
    * (the sketch's edge VALUES are engine-specific data elements — the
    * q45 argument), so the certified twin is [[quantileDrift]]. */
  def quantileDriftSketch(df: DataFrame, groupCol: String, valueCol: String,
                          ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
                          eps: Double = 0.005,
                          driftPpm: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("x"))
    val edges = base.select(col("x")).as[Double]
      .groupByKey(_ => 0)
      .agg(new Gk.GkAgg(eps, ps).toColumn.name("es"))
      // the Aggregator's output encoder is Kryo (a binary blob to SQL);
      // re-encode through the typed row so `es` is a real array<double>
      .map(_._2.toSeq)
      .toDF("es")
    driftFromEdges(base, edges, ps.length, driftPpm, groupCol)
  }

  /** Certification of [[quantileDriftSketch]] (the q45/q163
    * discipline): the EXACT drift report plus a per-source boolean
    * asserting the sketch-edge report's TVD landed within the GK rank
    * bound. Each of the E sketch edges sits within ε·N ranks of its
    * exact counterpart, so per edge at most min(ε·N, n_s) rows of
    * source s change bucket (and at most ε·N of the pool), moving the
    * TVD by at most E·(min(ε·N, n_s)/n_s + ε); the certificate doubles
    * that slack (flush/interpolation off-by-ones at rank boundaries)
    * and adds a ppm-floor cushion. The oracle replays the exact report
    * and pins `ok` TRUE; the sketch's edges are engine-specific data
    * elements and never cross engines. */
  def quantileDriftSketchCertified(df: DataFrame, groupCol: String,
                                   valueCol: String,
                                   ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
                                   eps: Double = 0.005,
                                   driftPpm: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = quantileDrift(df, groupCol, valueCol, ps, driftPpm)
    val sk = quantileDriftSketch(df, groupCol, valueCol, ps, eps, driftPpm)
      .select(col(groupCol), col("tvd_ppm").as("_tvd_sk"))
    val e = ps.length
    exact.join(sk, Seq(groupCol))
      .withColumn("_N", sum(col("n_rows")).over(Window.partitionBy()))
      .withColumn("_bound",
        lit(2.0 * e) * (least(lit(eps) * col("_N"), col("n_rows"))
          / col("n_rows") + lit(eps)) * lit(1e6) + lit(4L * e))
      .select(col(groupCol), col("n_rows"), col("tvd_ppm"), col("drifted"),
        (abs(col("tvd_ppm") - col("_tvd_sk")) <= col("_bound")).as("ok"))
  }

  /** [[quantileDrift]] against CALLER-SUPPLIED fixed edges — the
    * calibrated-monitoring form: edges are fit once (exact or GK, the
    * fitCurationModel discipline) and applied unchanged to every shard
    * or micro-batch, so drift numbers stay comparable over time and a
    * stream cannot make bucket membership depend on batch boundaries.
    * [[graft.streaming.StreamDrift]] is its resident twin. */
  def quantileDriftWithEdges(df: DataFrame, groupCol: String,
                             valueCol: String, edges: Seq[Double],
                             driftPpm: Long = 100000L): DataFrame = {
    val base = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("x"))
    driftFromCounts(bucketCounts(base, edges), driftPpm, groupCol)
  }

  /** Per-(group, bucket) counts of `base` (g, x) against fixed edges —
    * one map-side-combined shuffle; the ADDITIVE drift state a
    * streaming ledger accumulates. */
  private[graft] def bucketCounts(base: DataFrame,
                                  edges: Seq[Double]): DataFrame = {
    val bucket = edges
      .map(e => when(col("x") > lit(e), 1L).otherwise(0L))
      .reduce(_ + _)
    base.groupBy(col("g"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** The drift report's tail over a (g, bucket, cnt) frame — shared by
    * the in-plan forms and the streaming ledger fold.
    *
    * Single-consumer formulation (round-10 advice): the dense
    * groups × buckets grid is never materialized. A source MISSING a
    * bucket contributes exactly that bucket's global ppm mass to its
    * TVD sum (|0 − ppm_g| = ppm_g), so
    *   Σ_dense |ppm_s − ppm_g|
    *     = Σ_present (|ppm_s − ppm_g| − ppm_g) + Σ_buckets ppm_g
    * — per-group sums over the PRESENT pairs plus one global constant,
    * integer-exact. Everything reads `counts` once through window
    * functions, so there is no multi-consumer reuse point and nothing
    * to persist (the prior version pinned a cached frame per call for
    * the session lifetime). The global windows run on the
    * post-aggregation counts frame — groups × buckets rows, bounded at
    * any corpus size. */
  private[graft] def driftFromCounts(counts: DataFrame, driftPpm: Long,
                                     groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wB = Window.partitionBy(col("bucket"))
    val wAll = Window.partitionBy()
    counts
      .withColumn("cnt_g", sum(col("cnt")).over(wB))
      .withColumn("n_s", sum(col("cnt")).over(Window.partitionBy(col("g"))))
      .withColumn("n_g", sum(col("cnt")).over(wAll))
      .withColumn("_ppm_s", expr("(1000000 * cnt) div n_s"))
      .withColumn("_ppm_g", expr("(1000000 * cnt_g) div n_g"))
      .withColumn("_bn", row_number().over(wB.orderBy(col("g"))))
      // Σ_buckets ppm_g: each distinct bucket counted once
      .withColumn("_t", sum(when(col("_bn") === 1, col("_ppm_g"))).over(wAll))
      .groupBy(col("g"), col("n_s"), col("_t"))
      .agg(sum(abs(col("_ppm_s") - col("_ppm_g")) - col("_ppm_g")).as("_p"))
      .select(col("g").as(groupCol), col("n_s").as("n_rows"),
        expr("(_p + _t) div 2").as("tvd_ppm"))
      .withColumn("drifted", col("tvd_ppm") >= driftPpm)
  }

  private def driftFromEdges(base: DataFrame, edges: DataFrame, nEdges: Int,
                             driftPpm: Long, groupCol: String): DataFrame = {
    val bucket = (0 until nEdges)
      .map(i => when(col("x") > element_at(col("es"), i + 1), 1L)
        .otherwise(0L))
      .reduce(_ + _)
    // the (group, bucket) counts aggregate here, and driftFromCounts
    // consumes it ONCE (window form), so the corpus is scanned exactly
    // TWICE — once for the edges, once for the bucketing (the
    // quantile-then-bucket floor)
    val sb = base.crossJoin(broadcast(edges))
      .groupBy(col("g"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    driftFromCounts(sb, driftPpm, groupCol)
  }

  /** Gopher-style QUALITY signals (Rae et al. 2021 table A1's
    * non-repetition rules; the repetition half is
    * [[gopherRepetition]]): word count + bounds flag, mean word length,
    * symbol-to-word ratio (`#` and `...`), bullet-started and
    * ellipsis-ended line fractions, fraction of words containing an
    * alphabetic character. Everything is a scan-side column expression
    * (split + a few counting built-ins + small-array HOF filters), zero
    * shuffles — the whole battery rides the corpus scan at 100 TB.
    *
    * Ratios divide by `greatest(count, 1)` so empty docs/lines yield 0,
    * not NULL — single IEEE divisions with integer operands, engine-
    * stable (the q69/q116 discipline). */
  def gopherQuality(documents: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", sep: String = "\n",
                    minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val toks = filter(split(t, "\\s+"), w => w =!= "")
    val nW = greatest(size(toks), lit(1))
    val lines = split(t, java.util.regex.Pattern.quote(sep))
    val nL = greatest(size(lines), lit(1))
    val nonWs = length(regexp_replace(t, "\\s", ""))
    val nHash = length(t) - length(translate(t, "#", ""))
    val nEllipsis = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3)
    documents.select(col(idCol),
      size(toks).cast("long").as("n_words"),
      (nonWs.cast("double") / nW).as("mean_word_len"),
      ((nHash + nEllipsis).cast("double") / nW).as("symbol_word_ratio"),
      (size(filter(lines, l => l.startsWith("- "))).cast("double") / nL)
        .as("bullet_line_frac"),
      (size(filter(lines, l => l.endsWith("..."))).cast("double") / nL)
        .as("ellipsis_line_frac"),
      (size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nW)
        .as("alpha_word_frac"),
      size(toks).between(minWords, maxWords).as("length_ok"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", table A1)
    * — the per-document repetition filters a pre-training corpus applies
    * before mixing:
    *   - `top2_cnt`/`top2_gram`/`top2_frac`: the most frequent word
    *     2-gram (ties broken by gram text ascending) and the fraction of
    *     the document's characters its occurrences account for
    *     (cnt · len(gram) / len(text))
    *   - `dup3_frac`: fraction of characters accounted for by word
    *     3-grams that occur more than once (Σ cnt·len over grams with
    *     cnt ≥ 2, / len(text))
    *   - `dup_word_frac`: fraction of word occurrences beyond each
    *     word's first ((n − n_distinct) / n)
    *
    * Shape at scale: ONE scan of the text column (at 100 TB the scan IS
    * the cost — a per-n-gram-size branch would re-read it per n), both
    * gram sizes exploded from a single projection through two chained
    * Generates (no HOF lambdas — the interpreted-lambda trap the winnow
    * rewrite removed, BENCH_NOTES round-7), then exactly two map-side-
    * combinable aggregations: groupBy(doc, n, gram) collapses each
    * document's grams before the exchange (shuffle volume ~distinct
    * grams), and one groupBy(doc) folds both signals — no joins. The
    * per-doc scalars (char count, dup-word fraction) ride the partial
    * aggregates as max() of a per-doc constant instead of paying a
    * separate join.
    *
    * The top-gram argmax is `min(struct(-cnt, gram))`: struct ordering is
    * field-lexicographic, so minimizing (-cnt, gram) is exactly ORDER BY
    * cnt DESC, gram ASC LIMIT 1 — deterministic under ties, same rule the
    * oracle's row_number enforces. */
  def gopherRepetition(documents: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val chars = greatest(length(col(textCol)), lit(1)).cast("double")
    val tk = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    // _i = 0 -> 2-grams, _i = 1 -> 3-grams; posexplode keeps the tag
    val tagged = documents.select(col(idCol), chars.as("_chars"),
      ((size(tk) - size(array_distinct(tk))).cast("double") /
        greatest(size(tk), lit(1))).as("_dwf"),
      posexplode(array(Dedup.shingles(col(textCol), 2),
        Dedup.shingles(col(textCol), 3))).as(Seq("_i", "_arr")))
    val counts = tagged
      .select(col(idCol), col("_chars"), col("_dwf"), col("_i"),
        explode(col("_arr")).as("g"))
      .groupBy(col(idCol), col("_i"), col("g"))
      .agg(count(lit(1)).as("cnt"),
        max(col("_chars")).as("_chars"), max(col("_dwf")).as("_dwf"))
    counts.groupBy(col(idCol))
      .agg(
        min(when(col("_i") === 0,
          struct((-col("cnt")).as("nc"), col("g").as("g")))).as("m"),
        coalesce(sum(when(col("_i") === 1 && col("cnt") >= 2,
          col("cnt") * length(col("g")))), lit(0L)).cast("long").as("_dup3"),
        max(col("_chars")).as("_chars"), max(col("_dwf")).as("_dwf"))
      .select(col(idCol), (-col("m.nc")).as("top2_cnt"),
        col("m.g").as("top2_gram"),
        (((-col("m.nc")) * length(col("m.g"))).cast("double") / col("_chars"))
          .as("top2_frac"),
        (col("_dup3").cast("double") / col("_chars")).as("dup3_frac"),
        col("_dwf").as("dup_word_frac"))
  }

  /** [[gopherRepetition]] computed scan-side in one codegen'd pass
    * ([[graft.expr.GopherRepetitionStats]]): identical columns and
    * values, ZERO shuffles. The relational form above pushes every word
    * 2-/3-gram through an exchange (~237M gram rows at 1M docs — the
    * suite's heaviest per-byte op); this one counts grams in a per-row
    * hash map, so at 100 TB the operator runs at parquet-scan speed and
    * nothing leaves the mapper. The relational form is kept as the
    * oracle-mirroring definition; GopherFastSpec pins row equality
    * between the two on planted and adversarial fixtures. */
  def gopherRepetitionFast(documents: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val chars = greatest(length(col(textCol)), lit(1)).cast("double")
    val s = graft.expr.Exprs.gopherRepetitionStats(col(textCol))
    documents
      .select(col(idCol), chars.as("_chars"), s.as("_s"))
      .select(col(idCol),
        col("_s.top2_cnt").as("top2_cnt"),
        col("_s.top2_gram").as("top2_gram"),
        ((col("_s.top2_cnt") * length(col("_s.top2_gram"))).cast("double") /
          col("_chars")).as("top2_frac"),
        (col("_s.dup3_chars").cast("double") / col("_chars")).as("dup3_frac"),
        ((col("_s.n_words") - col("_s.n_distinct")).cast("double") /
          greatest(col("_s.n_words"), lit(1L))).as("dup_word_frac"))
  }

  /** The Stack / StarCoder source-file filters (Kocetkov et al. 2022
    * §2.2; Li et al. 2023 §3.1) — the cheap structural cuts a code
    * corpus applies before any model-based scoring:
    *   - `max_line_len` > 1000 → drop (minified / data blobs),
    *   - `avg_line_len` > 100 → drop,
    *   - `alnum_frac` < 0.25 → drop (binary-ish / ASCII-art),
    *   - an auto-generated marker ("auto-generated", "autogenerated",
    *     "generated by") in the first five lines → drop.
    * Emits the signals plus the combined `keep` verdict so callers can
    * re-threshold without rescanning.
    *
    * Shape at scale: one scan, pure per-row column math — zero shuffles,
    * zero joins. avg/frac are double divisions of exact integer totals,
    * so any engine derives identical values. */
  def stackCodeFilters(documents: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", sep: String = "\n",
                       maxLineLen: Int = 1000, maxAvgLineLen: Int = 100,
                       minAlnumFrac: Double = 0.25): DataFrame = {
    val t = col(textCol)
    val lines = split(t, java.util.regex.Pattern.quote(sep))
    val lens = transform(lines, l => length(l).cast("long"))
    val maxLen = array_max(lens)
    val avgLen = aggregate(lens, lit(0L), (acc, x) => acc + x).cast("double") /
      greatest(size(lines), lit(1))
    val alnum = (length(t) - length(regexp_replace(t, "[A-Za-z0-9]", "")))
      .cast("double") / greatest(length(t), lit(1))
    val head5 = lower(array_join(slice(lines, 1, 5), sep))
    val autogen = head5.contains("auto-generated") ||
      head5.contains("autogenerated") || head5.contains("generated by")
    documents.select(col(idCol),
      maxLen.as("max_line_len"), avgLen.as("avg_line_len"),
      alnum.as("alnum_frac"), autogen.as("autogen"),
      (maxLen <= maxLineLen && avgLen <= maxAvgLineLen &&
        alnum >= minAlnumFrac && !autogen).as("keep"))
  }

  /** Unigram-entropy quality gate (the RefinedWeb/Dolma "unigram entropy"
    * filter) in the exact-integer discipline: per doc, the scan-side
    * [[graft.expr.UnigramEntropyStats]] pass emits token count N,
    * distinct count, and surprisal_sum = Σ c·floor(log2(N div c)); this
    * wrapper derives
    *
    *   norm_milli = surprisal_sum·1000 div (N·floor(log2 N))   (N >= 2)
    *
    * — permille of the all-tokens-unique bound, so 0 = one token
    * repeated wall-to-wall, 1000 = every token distinct — and a verdict:
    * `short` (N < 2, no distribution to judge), `repetitive`
    * (< `loMilli`), `mixed`, `diverse` (>= `hiMilli`). Catches the
    * keyword-stuffing / template-spam class whose *n-gram* repetition
    * can be low (shuffled spam defeats [[gopherRepetition]] — 2-grams
    * vary — but the unigram DISTRIBUTION cannot be shuffled away).
    *
    * Shape at scale: one scan, per-row hash-map counting inside codegen,
    * zero shuffles/joins — the q116 gopherRepetitionFast shape. All
    * arithmetic is exact integer (floor-log2 = binary length - 1), so
    * the q142 DuckDB oracle replays every value. */
  def unigramEntropy(documents: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     loMilli: Long = 300L, hiMilli: Long = 700L): DataFrame = {
    val s = graft.expr.Exprs.unigramEntropyStats(col(textCol))
    documents.select(col(idCol), s.as("_s"))
      .select(col(idCol), col("_s.n_tokens").as("n_tokens"),
        col("_s.n_distinct").as("n_distinct"),
        col("_s.surprisal_sum").as("surprisal_sum"))
      // `div`, not Column./: on longs the latter is DOUBLE division,
      // which diverges from the oracle's integer // past 2^53 (the
      // Retrieval.scala fixed-point rule); operands are non-negative so
      // div == floor-divide in both engines
      .withColumn("norm_milli",
        when(col("n_tokens") >= 2,
          expr("(surprisal_sum * 1000) div (n_tokens * " +
            "(length(conv(cast(n_tokens as string), 10, 2)) - 1))"))
          .otherwise(0L))
      .withColumn("verdict",
        when(col("n_tokens") < 2, "short")
          .when(col("norm_milli") < loMilli, "repetitive")
          .when(col("norm_milli") < hiMilli, "mixed")
          .otherwise("diverse"))
  }

  /** k-anonymity audit (Sweeney '02) over quasi-identifier columns —
    * the privacy-risk REPORT that complements the PII redaction pass
    * (q48 removes direct identifiers; re-identification risk lives in
    * the quasi-identifier COMBINATIONS that survive it). One row per
    * equivalence class: the QI tuple, its population, and whether it
    * meets `k` — classes below k are the linkage-attack surface.
    *
    * Shape at scale: a single groupBy on the QI columns (one shuffle,
    * map-side combined); output is bounded by the QI domain product,
    * not the row count. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long = 10L): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("k_anonymous", col("class_size") >= k)

  /** l-diversity audit (Machanavajjhala '06) — k-anonymity's blind spot:
    * a class can be large yet reveal everything when all its members
    * share one SENSITIVE value (the homogeneity attack). One row per QI
    * equivalence class with its population, the number of distinct
    * sensitive values, and whether it meets `l`. Same single-groupBy
    * scale shape as [[kAnonymity]] (count distinct is exact here —
    * the sensitive domain per class is what is being measured). */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Long = 3L): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("l_diverse", col("distinct_sensitive") >= l)

  /** t-closeness audit (Li et al. '07) — the remaining blind spot after
    * [[kAnonymity]] and [[lDiversity]]: a class can be large AND diverse
    * yet still leak when its sensitive-value DISTRIBUTION differs sharply
    * from the table's (skewness attack: "this class is 90% high-balance"
    * is a disclosure even with many distinct values present). Per QI
    * equivalence class, the Earth Mover's Distance between the class's
    * distribution over the ORDERED sensitive attribute and the global
    * one; for ordered domains with unit ground distance,
    * EMD = Σ_i |P_cum(i) − Q_cum(i)| / (m − 1) over the m global values.
    *
    * Exact fixed-point discipline: cumulative fractions are quantized to
    * ppm FIRST (`(1e6·cum) div size`, positive operands so trunc == floor
    * across engines), then differenced — every intermediate is a BIGINT
    * both engines compute identically, and `emd_ppm` is the metric's
    * contract (no float EMD whose summation order could differ). Rows
    * with a NULL sensitive value are excluded up front (a NULL has no
    * position in an ordered domain; engines also disagree on NULL sort
    * placement).
    *
    * Shape at scale: the global distribution is domain-bounded and its
    * cumsum runs through [[Perplexity.cumulativeByValue]] (no global
    * window on data-dependent cardinality); the dense class×domain grid
    * is (QI domain)×m — audit-bounded, never row-count-bounded — with
    * the m-row value list broadcast, and the per-class cumsum window is
    * partitioned by class over ≤ m rows. */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 tPpm: Long = 200000L): DataFrame = {
    val qi = qiCols.map(col)
    val base = df.where(col(sensitiveCol).isNotNull)
      .withColumn("_v", col(sensitiveCol).cast("long"))
    val g = base.groupBy(col("_v")).agg(count(lit(1)).as("_cnt_g"))
    val gCum = Perplexity.cumulativeByValue(g, "_v", "_cnt_g")
      .withColumnRenamed("_cum", "_cum_g")
      .select(col("_v"), col("_cum_g"))
    val tot = g.agg(sum(col("_cnt_g")).as("_n"), count(lit(1)).as("_m"))
    val classes = base.groupBy(qi: _*).agg(count(lit(1)).as("class_size"))
    val cc = base.groupBy(qi :+ col("_v"): _*).agg(count(lit(1)).as("_cnt_c"))
      .select(qiCols.map(c => col(c).as(s"_r_$c")) :+
        col("_v").as("_r_v") :+ col("_cnt_c"): _*)
    val w = Window.partitionBy(qi: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE equality on the QI keys: a NULL QI value forms its own
    // equivalence class in kAnonymity/lDiversity, and a plain equi-join
    // here would drop that class's counts and report a spurious maximal
    // EMD for it
    val joinCond = (qiCols.map(c => col(c) <=> col(s"_r_$c")) :+
      (col("_v") === col("_r_v"))).reduce(_ && _)
    classes.crossJoin(broadcast(gCum))
      .join(cc, joinCond, "left")
      .na.fill(0L, Seq("_cnt_c"))
      .drop(qiCols.map(c => s"_r_$c") :+ "_r_v": _*)
      .withColumn("_cum_c", sum(col("_cnt_c")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("_diff", abs(
        expr("(1000000L * _cum_c) div class_size")
          - expr("(1000000L * _cum_g) div _n")))
      .groupBy(qi :+ col("class_size") :+ col("_m"): _*)
      .agg(sum(col("_diff")).as("_s"))
      .withColumn("emd_ppm",
        when(col("_m") <= 1L, lit(0L)).otherwise(expr("_s div (_m - 1)")))
      .withColumn("t_close", col("emd_ppm") <= tPpm)
      .drop("_s", "_m")
  }

  /** Suppression-based k-anonymization: drop every row whose QI class
    * is below `k` (the simplest enforcement; generalization hierarchies
    * are domain-specific and belong to the caller). The violating-class
    * list joins back equi-keyed on the QI columns, so the plan is the
    * audit's aggregation plus one join — no row-level state. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long = 10L): DataFrame = {
    val bad = kAnonymity(df, qiCols, k)
      .where(!col("k_anonymous"))
      .select(qiCols.map(c => col(c).as(s"_b_$c")): _*)
    // null-SAFE anti-join: the audit's groupBy treats a NULL QI value as
    // its own equivalence class (as does tCloseness), so enforcement
    // must too — a plain equi-anti-join never matches NULL keys and
    // would pass every sub-k NULL-keyed class through un-suppressed
    val cond = qiCols.map(c => df(c) <=> col(s"_b_$c")).reduce(_ && _)
    df.join(bad, cond, "left_anti")
  }

  /** Cohen's kappa — inter-rater agreement on labeled data, the QA
    * metric preference/RLHF datasets publish (two raters labeling the
    * same items; raw agreement is inflated by chance, kappa corrects:
    * κ = (p_o − p_e)/(1 − p_e) with p_e the agreement two INDEPENDENT
    * raters with these marginals would reach). Exact ppm fixed point
    * (the tCloseness discipline): p_o and p_e quantize to ppm FIRST;
    * the final division keeps both operands POSITIVE — `div` truncates
    * toward zero in Spark but floors in SQL `//`, and they differ on
    * negatives — so κ's sign is factored out and reapplied after the
    * division. One row: (n_items, po_ppm, pe_ppm, kappa_ppm);
    * kappa_ppm is NULL when p_e = 1 (both raters constant — κ is
    * undefined, not zero). Rows where either label is NULL are
    * excluded (unrated items carry no agreement evidence).
    *
    * Overflow discipline (round-11 advice): pe's numerator is
    * Σ na·nb ≤ n², so 10^6·pe_num overflows int64 once n passes ~3e6
    * — both the marginal-product sum and the ppm scaling route through
    * decimal(38,0), keeping the arithmetic exact to n ~ 3e15 items
    * (beyond any rated corpus) instead of silently wrapping under
    * non-ANSI semantics. po's scaling gets the same treatment.
    *
    * Shape at scale: one map-side-combined pair-count aggregation plus
    * two label-marginal aggregations joined on label — every frame
    * after the first pass is bounded by the label-alphabet size. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
    val counts = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val na = counts.groupBy(col("a").as("k")).agg(sum(col("c")).as("na"))
    val nb = counts.groupBy(col("b").as("k")).agg(sum(col("c")).as("nb"))
    val peNum = na.join(nb, Seq("k"))
      .agg(coalesce(sum(col("na").cast("decimal(38,0)") * col("nb")),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    totals.crossJoin(peNum)
      .select(col("n").as("n_items"),
        expr("cast((1000000 * cast(agree as decimal(38,0))) div n as bigint)")
          .as("po_ppm"),
        expr("cast((1000000 * pe_num) div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("pe_ppm"))
      .withColumn("kappa_ppm", {
        val num = col("po_ppm") - col("pe_ppm")
        val den = lit(1000000L) - col("pe_ppm")
        when(den === 0L, lit(null).cast("long"))
          .otherwise(when(num < 0L, -1L).otherwise(1L) *
            expr("(1000000 * abs(po_ppm - pe_ppm)) div (1000000 - pe_ppm)"))
      })
  }

  /** Calibration report — per-bucket reliability of a [0, 1e6]-ppm
    * confidence score against boolean labels, plus the expected
    * calibration error (Naeini et al. 2015's ECE, the metric
    * model-scored quality filters should publish before their scores
    * gate a corpus): scores bucket uniformly, each bucket reports its
    * mean score vs its empirical positive rate, and ECE is the
    * n-weighted mean absolute gap. Exact ppm integer arithmetic
    * end-to-end; no product exceeds n·1e6. The per-bucket frame is
    * bounded by `buckets`, so the ECE window is audit-sized. */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        buckets: Int = 10): DataFrame = {
    require(buckets > 0)
    import org.apache.spark.sql.expressions.Window
    val b = least(expr(s"($scoreCol * $buckets) div 1000000"),
      lit(buckets - 1L)).as("bucket")
    val base = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(b, col(scoreCol).cast("long").as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
    val wAll = Window.partitionBy()
    base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("_ss"),
        sum(col("y")).as("_pos"))
      .select(col("bucket"), col("n"),
        expr("_ss div n").as("mean_score_ppm"),
        expr("(1000000 * _pos) div n").as("pos_ppm"))
      .withColumn("gap_ppm", abs(col("mean_score_ppm") - col("pos_ppm")))
      .withColumn("_wsum", sum(col("n") * col("gap_ppm")).over(wAll))
      .withColumn("_nsum", sum(col("n")).over(wAll))
      .withColumn("ece_ppm", expr("_wsum div _nsum"))
      .drop("_wsum", "_nsum")
  }

  /** Per-source corpus DATASHEET — the summary block "Datasheets for
    * Datasets" (Gebru et al. '21, CACM) asks every published corpus to
    * carry, as one query: per source, the volume (docs, chars, mean
    * chars), the exact-duplication exposure (ppm of docs whose text is
    * byte-identical to at least one other doc ANYWHERE in the corpus —
    * the q20 (md5, length)-keyed rule, so cross-source duplication
    * shows up in BOTH sources' rows), and the dominant language with
    * its share (modal lang, ties to the lexicographically smallest —
    * NULL langs fold to '' so both engines order them identically).
    *
    * Exact ppm fixed point; `1e6·dup_docs` routes through
    * decimal(38,0) (the [[cohenKappa]] overflow discipline — per-source
    * doc counts pass 9e12 on web-scale corpora). NULL-text docs hash
    * to a per-doc sentinel (never spuriously "duplicates" of each
    * other) and count chars as 0.
    *
    * Shape at scale: one scan emits (source, lang, md5, len) — text
    * never shuffles; the df count and both rollups are map-side-
    * combined aggregations; the modal-lang window runs over the
    * source×lang alphabet (audit-sized). */
  def datasheet(documents: DataFrame, sourceCol: String = "source",
                langCol: String = "lang", idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    // NULL source folds to '' like _lang — otherwise the inner join with
    // the modal-lang frame drops the NULL-source volume row (NULL join
    // keys never match) and those documents silently vanish.
    val base = documents.select(col(idCol),
      coalesce(col(sourceCol), lit("")).as(sourceCol),
      coalesce(col(langCol), lit("")).as("_lang"),
      coalesce(length(col(textCol)).cast("long"), lit(0L)).as("_nc"),
      coalesce(md5(col(textCol).cast("binary")),
        concat(lit("n:"), col(idCol).cast("string"))).as("_h"))
    val dfc = base.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    val vol = base.join(dfc, Seq("_h"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nc")).as("n_chars"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("_dd"))
    val lc = base.groupBy(col(sourceCol), col("_lang"))
      .agg(count(lit(1)).as("_lc"))
    val wTop = Window.partitionBy(col(sourceCol))
      .orderBy(col("_lc").desc, col("_lang").asc)
    val top = lc.withColumn("_rn", row_number().over(wTop))
      .where(col("_rn") === 1)
      .select(col(sourceCol), col("_lang").as("top_lang"),
        col("_lc").as("_tc"))
    vol.join(top, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_chars"),
        expr("n_chars div n_docs").as("mean_chars"),
        expr("cast((1000000 * cast(_dd as decimal(38,0))) div n_docs as bigint)")
          .as("exact_dup_ppm"),
        col("top_lang"),
        expr("cast((1000000 * cast(_tc as decimal(38,0))) div n_docs as bigint)")
          .as("top_lang_ppm"))
  }

  /** License-marker census — the compliance pass code/web training sets
    * run before anything else (The Stack v1/v2 keep only
    * permissively-licensed files; BigCode publishes exactly this
    * census): per document, the SPDX header identifier if one exists
    * (`SPDX-License-Identifier: <id>` — the machine-readable form SPDX
    * specifies), marker-phrase hits for the copyleft and permissive
    * families, and a single verdict by fixed precedence
    *
    *   spdx id (classified by its prefix) > copyleft phrase >
    *   permissive phrase > 'none'
    *
    * — an explicit SPDX declaration outranks prose mentions (a file
    * may DISCUSS the GPL while being MIT-declared), and copyleft
    * outranks permissive among prose hits because the conservative
    * read is the one a compliance gate must take.
    *
    * Engine-portable: every pattern is lookaround-free and runs
    * verbatim in Java regex and RE2; case-insensitivity via `(?i)`,
    * supported by both. One scan, zero shuffles, regex evaluated once
    * per row outside any lambda. */
  def licenseCensus(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    withLicenseCols(df.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("spdx_id"), col("has_copyleft"),
        col("has_permissive"), col("license_class"))

  /** [[licenseCensus]]'s verdict columns APPENDED to `df` (spdx_id,
    * has_copyleft, has_permissive, license_class) — the scan-side form
    * a composed sweep ([[graft.ops.Pipeline.governanceSweep]]) fuses
    * into ONE corpus projection instead of an id-keyed join of the
    * projected census. Same expressions as [[licenseCensus]], which is
    * implemented on top of this. */
  def withLicenseCols(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val spdx = regexp_extract(t,
      "SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)", 1)
    val copyleft = t.rlike(
      "(?i)GNU (Affero |Lesser )?General Public License|\\b[AL]?GPL-?[0-9]|\\bGPL\\b|Creative Commons|\\bCC-BY")
    val permissive = t.rlike(
      "(?i)MIT License|Apache License|BSD [0-9]-Clause|\\bISC License|\\bUnlicense\\b")
    val spdxClass =
      when(upper(col("spdx_id")).rlike("^(A?GPL|LGPL|CC-BY-SA|EUPL|MPL)"),
        lit("copyleft"))
        .when(upper(col("spdx_id")).rlike("^(MIT|APACHE|BSD|ISC|UNLICENSE|ZLIB|CC0)"),
          lit("permissive"))
        .otherwise(lit("other-spdx"))
    df.withColumn("spdx_id", spdx)
      .withColumn("has_copyleft", copyleft)
      .withColumn("has_permissive", permissive)
      .withColumn("license_class",
        when(col("spdx_id") =!= "", spdxClass)
          .when(col("has_copyleft"), lit("copyleft"))
          .when(col("has_permissive"), lit("permissive"))
          .otherwise(lit("none")))
      .withColumn("spdx_id",
        when(col("spdx_id") === "", lit(null)).otherwise(col("spdx_id")))
  }

  /** q213's deterministic marker injection (the corpus carries no
    * licenses): by doc_id mod 5 — an SPDX MIT header, an SPDX GPL-3.0
    * header, a GPL prose phrase, an Apache prose phrase, or nothing.
    * Doc 2 (mod 5) also mentions MIT prose AFTER the GPL phrase, so
    * the copyleft-over-permissive precedence is exercised, and doc 0
    * mentions the GPL in prose under an MIT SPDX header — the
    * spdx-over-prose rule. */
  def injectLicenses(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      concat_ws(" ",
        substring(col("text"), 1, 20),
        when(col("doc_id") % 5 === 0,
          lit("SPDX-License-Identifier: MIT (not the GNU General Public License)"))
          .when(col("doc_id") % 5 === 1,
            lit("SPDX-License-Identifier: GPL-3.0-only"))
          .when(col("doc_id") % 5 === 2,
            lit("under the GNU General Public License; MIT License text follows"))
          .when(col("doc_id") % 5 === 3,
            lit("licensed under the Apache License, Version 2.0"))
          .otherwise(lit("")),
        substring(col("text"), 21, 1000000)).as("text"))

  /** Flesch reading-ease readability (Flesch '48; the readability
    * heuristic curation recipes bolt on next to the Gopher/C4 counts —
    * a cheap fluency prior that needs no model): per document,
    *
    *   FRE = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word)
    *
    * in exact integer MILLI units. Heuristics, documented: words =
    * whitespace tokens; sentences = runs of terminal punctuation
    * `[.!?]+` (min 1, so fragments still score); syllables = runs of
    * vowels `[aeiouy]` — the classic approximation (each vowel group ≈
    * one nucleus). The vowel class is spelled `[aeiouyAEIOUY]`, NOT
    * `lower()` + `[aeiouy]`: case folding is the one step where engine
    * unicode tables could disagree, and an ASCII class sidesteps it.
    *
    *   wps_milli = 1000·W div S,  spw_milli = 1000·Y div W
    *   fre_milli = 206835 − (1015·wps_milli) div 1000
    *                      − (84600·spw_milli) div 1000
    *
    * Every division operand is non-negative (the subtractions run
    * after all division), so Spark `div` == DuckDB `//`. A wordless
    * or NULL-text document keeps its row with NULL metrics (zero
    * counts — the malformed-rows-surface rule), and the verdict band
    * uses the standard Flesch cut points (90/80/70/60/50/30).
    *
    * One scan, zero shuffles: three codegen'd regexp counts per row,
    * no lambda, no UDF — at 100 TB this runs at scan speed. */
  def readability(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    withReadabilityCols(df.select(col(idCol), col(textCol)), textCol)
      .drop(textCol)

  /** [[readability]]'s metric columns APPENDED to `df` (n_words ..
    * fre_band) — the scan-side form [[graft.ops.Pipeline
    * .governanceSweep]] fuses into one corpus projection (the
    * [[withLicenseCols]] shape). Same expressions as [[readability]],
    * which is implemented on top of this. */
  def withReadabilityCols(df: DataFrame,
                          textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val counted = df
      .withColumn("n_words", when(t.isNull, lit(0L))
        .otherwise(size(TextAnalysis.tokens(t)).cast("long")))
      .withColumn("n_sentences", when(t.isNull, lit(0L))
        .otherwise(greatest(regexp_count(t, lit("[.!?]+")), lit(1))
          .cast("long")))
      .withColumn("n_syllables", when(t.isNull, lit(0L))
        .otherwise(regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("long")))
    counted
      .withColumn("wps_milli",
        expr("case when n_words > 0 then (1000 * n_words) div n_sentences end"))
      .withColumn("spw_milli",
        expr("case when n_words > 0 then (1000 * n_syllables) div n_words end"))
      .withColumn("fre_milli", expr(
        """case when n_words > 0 then 206835
          |  - (1015 * wps_milli) div 1000
          |  - (84600 * spw_milli) div 1000 end""".stripMargin))
      .withColumn("fre_band",
        when(col("fre_milli").isNull, lit(null).cast("string"))
          .when(col("fre_milli") >= 90000L, lit("very_easy"))
          .when(col("fre_milli") >= 80000L, lit("easy"))
          .when(col("fre_milli") >= 70000L, lit("fairly_easy"))
          .when(col("fre_milli") >= 60000L, lit("standard"))
          .when(col("fre_milli") >= 50000L, lit("fairly_difficult"))
          .when(col("fre_milli") >= 30000L, lit("difficult"))
          .otherwise(lit("very_confusing")))
  }
}
