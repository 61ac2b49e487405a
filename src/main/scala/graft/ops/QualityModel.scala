package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality scoring (the FineWeb-Edu shape — Penedo et al.
  * 2024 train a classifier on LLM-graded samples and score every crawl
  * document with it; Brown et al. 2020 appendix A used the same
  * train-on-labels / score-the-crawl pattern for GPT-3's quality
  * filtering): a LEARNED scalar quality head over hashed char-gram
  * features, complementing the rule-based batteries ([[Quality]]'s
  * Gopher/C4/Stack filters) that q131's pipeline chains.
  *
  * Re-expressed under the engine-exact integer discipline:
  *
  *  - features: hashed char 2-/3-gram buckets
  *    ([[graft.expr.CharGramBuckets]] / the inline fold of
  *    [[graft.expr.LinearGramScore]]);
  *  - model: per-bucket SMOOTHED MEAN LABEL, integer-scaled —
  *    `w(b) = (scale * (label_sum(b) + lbar)) DIV (gram_cnt(b) + 1)`
  *    where `lbar = total_label_sum DIV total_gram_cnt` is one
  *    pseudo-observation at the global mean (empirical-Bayes shrinkage:
  *    rare buckets pull to the corpus mean instead of their noisy
  *    estimate). A per-gram weight is then ≈ scale·E[label | gram], and
  *    a document's `score_sum DIV n_feats` is an integer estimate of
  *    scale·(its expected label) — the regression-head analog, exact in
  *    longs where a float least-squares fit would drift across engines;
  *  - scoring: the weight vector (exactly `buckets` longs) ships INSIDE
  *    the plan via [[graft.expr.LinearGramScore]] — scoring is one
  *    corpus scan, zero joins, zero shuffles (the q23b scan-side
  *    discipline);
  *  - tiers: CCNet-style value-threshold tertiles over the avg score
  *    ([[Perplexity.valueTertiles]] — thresholds from the distinct-value
  *    histogram with every sort bounded), labeled low/medium/high in
  *    ascending-score order.
  *
  * Scale shape: training is one scan of the (small) labeled set + two
  * bounded aggregations; the model table is ≤ buckets rows (broadcast /
  * driver-collectable at any corpus size — the IVF-centroid discipline);
  * scoring touches the corpus exactly once. Docs with no gram evidence
  * are dropped (the no-evidence rule shared with [[LangId]]/[[Importance]]).
  */
object QualityModel {

  /** (bucket, w) integer weight table from a labeled corpus — the full
    * `buckets`-row grid, so unseen buckets carry the shrunk global-mean
    * weight instead of silently dropping. `labelCol` must be integral
    * (FineWeb-Edu grades 0..5; any non-negative integer scale works). */
  def train(labeled: DataFrame, buckets: Int = 2048, scale: Long = 10000L,
            labelCol: String = "label", textCol: String = "text"): DataFrame = {
    val g = labeled.select(col(labelCol).cast("long").as("_l"),
      explode(graft.expr.Exprs.charGramBuckets(lower(col(textCol)), buckets)).as("bucket"))
    val agg = g.groupBy("bucket")
      .agg(sum(col("_l")).as("ls"), count(lit(1)).as("c"))
    // global totals re-aggregated from the ≤ buckets-row table, not the
    // gram stream — one narrow pass
    val glob = agg.agg(sum(col("ls")).as("gls"), sum(col("c")).as("gc"))
    val grid = glob.select(col("gls"), col("gc"),
      explode(sequence(lit(0L), lit(buckets - 1L))).as("bucket"))
    grid.join(agg, Seq("bucket"), "left")
      .select(col("bucket"),
        expr(s"($scale * (coalesce(ls, 0) + (gls DIV gc))) DIV (coalesce(c, 0) + 1)")
          .cast("long").as("w"))
  }

  /** Collect a trained grid into the in-plan weight vector — bounded
    * driver materialization (EXACTLY `buckets` rows by construction; the
    * [[LangId.langIdFasttext]] / IVF-centroid discipline). */
  def collectWeights(model: DataFrame, buckets: Int): Seq[Long] = {
    val w = new Array[Long](buckets)
    model.select(col("bucket"), col("w")).collect()
      .foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    w.toSeq
  }

  /** Score every document scan-side against a collected weight vector:
    * (id, n_feats, score_sum, avg_w). Docs with no gram evidence drop. */
  def score(docs: DataFrame, weights: Seq[Long], idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        graft.expr.Exprs.linearGramScore(lower(col(textCol)), weights).as("_s"))
      .where(col("_s").isNotNull)
      .select(col(idCol), col("_s.n_feats").as("n_feats"),
        col("_s.score_sum").as("score_sum"))
      .withColumn("avg_w", expr("score_sum DIV n_feats"))

  /** End-to-end: train on the labeled set, score the corpus, tag
    * low/medium/high quality tiers by value-threshold tertiles of the
    * average per-gram weight (ascending: the bottom third of scores is
    * `low`). The scored frame is persisted across the threshold
    * derivation and the final tagging so the corpus is scanned once
    * (callers own no cleanup — Verify/Bench clear the cache between
    * queries; long-lived callers unpersist via the returned plan's
    * lineage, the [[Perplexity.perplexityBuckets]] discipline). */
  def qualityTiers(corpus: DataFrame, labeled: DataFrame,
                   buckets: Int = 2048, scale: Long = 10000L,
                   idCol: String = "doc_id", textCol: String = "text",
                   labelCol: String = "label"): DataFrame = {
    val weights = collectWeights(train(labeled, buckets, scale, labelCol, textCol), buckets)
    val scored = score(corpus, weights, idCol, textCol).persist()
    Perplexity.valueTertiles(scored, "avg_w", "q_tier", "low", "medium", "high")
      .select(col(idCol), col("n_feats"), col("score_sum"), col("avg_w"), col("q_tier"))
  }

  // ------------------------------- iteratively trained logistic head

  /** Quantized feature/label frame for [[logregTrain]]: per doc, three
    * integer features on a 0..15 grid (length bucket, word-count bucket,
    * punctuation-fraction bucket — each recomputable by the oracle from
    * the text alone) plus the binary label, aggregated to one row per
    * DISTINCT feature vector with (n, npos) counts. This is the device
    * that makes full-batch gradient descent a BOUNDED iteration (the
    * [[Chat.bradleyTerry]] discipline): the corpus is scanned ONCE to
    * build a ≤ 16³-row frame, and every GD round after that is exact
    * arithmetic over the frame — quantizing features first means the
    * frame-based gradient is IDENTICAL to the per-document gradient,
    * not an approximation of it. Label: the doc contains " the "
    * (a stand-in for an upstream labeler; any boolean column works). */
  def logregFrame(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    logregFeatures(docs, idCol, textCol)
      .groupBy(col("x1"), col("x2"), col("x3"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
      .transform(graft.plans.CheckpointAudit.local)

  /** Full-batch gradient descent for a logistic quality head, exact in
    * integer ppm — the TRAINED-classifier leg the GPT-3 / CCNet crawl
    * filters describe (Brown et al. 2020 appendix A; Wenzek et al. 2020
    * train linear classifiers over crawl features), next to [[train]]'s
    * closed-form smoothed-mean head. Runs `iters` rounds of
    *
    *   w_j ← w_j − η · Σ_cells (n·σ(z) − npos·10⁶) · x_j / N
    *
    * over the quantized frame, with the HARD sigmoid
    * σ(z) = clamp(z/4 + ½, 0, 1) (Courbariaux et al. 2015's
    * hard-sigmoid device) in place of the transcendental logistic —
    * exp(·) has no cross-engine exact replay, the piecewise-linear
    * surrogate is closed under integer arithmetic, and its clamped
    * shifted division is engine-stable even where z + 2·10⁶ goes
    * negative: Spark's truncating `div` and DuckDB's flooring `//`
    * differ by at most 1 there, and both land below the 0-clamp.
    * Gradient sums route through decimal(38,0) (n·10⁶·15 per cell wraps
    * int64 near N ~ 6·10⁸) and the update divides MAGNITUDES with the
    * sign factored out (the [[Quality.cohenKappa]] rule). Each round is
    * one broadcast of the 1-row weight frame + one aggregation of the
    * ≤ 16³-row feature frame, checkpointed so the plan never nests —
    * iteration cost is corpus-independent. Returns the 1-row
    * (w0, w1, w2, w3) ppm weight frame. */
  def logregTrain(frame: DataFrame, iters: Int = 8,
                  lrNum: Long = 1L, lrDen: Long = 64L): DataFrame = {
    require(iters >= 1 && lrNum > 0 && lrDen > 0)
    val spark = frame.sparkSession
    // r18: the quantized frame is BOUNDED at 16^3 rows by construction
    // (each feature is clamped to 0..15), so the whole descent runs on
    // the driver over one bounded collect — the IVF-centroid /
    // embeddingProbeWeights discipline — instead of 8 checkpointed
    // rounds of (broadcast weight ⋈ frame → aggregate → broadcast
    // gradient → checkpoint), which cost 8 jobs + 16 broadcasts per
    // training call with corpus-independent but fixed overhead. The
    // arithmetic below replays the relational form EXACTLY: BigInt
    // carries the decimal(38,0) gradient sums (order-independent exact
    // addition), `/` on a non-negative numerator is the same integral
    // division `div` performs, and the hard-sigmoid's truncating
    // division on negatives lands under the 0-clamp on both paths (the
    // class doc's cross-engine argument, unchanged).
    val cells = frame.select(col("x1"), col("x2"), col("x3"),
      col("n"), col("npos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nTotal = BigInt(cells.map(_._4).sum.max(1L))
    val den = BigInt(lrDen) * nTotal
    val w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to iters) {
      val s = Array(BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      cells.foreach { case (x1, x2, x3, n, npos) =>
        val z = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        // Long `/` truncates toward zero, exactly Spark's `div`
        val p = math.min(math.max((z + 2000000L) / 4L, 0L), 1000000L)
        val r = BigInt(n) * p - BigInt(npos) * 1000000L
        s(0) += r; s(1) += r * x1; s(2) += r * x2; s(3) += r * x3
      }
      for (j <- 0 to 3) {
        val step = (BigInt(lrNum) * s(j).abs) / den
        w(j) = w(j) - s(j).signum * step.toLong
      }
    }
    spark.range(1).select(lit(w(0)).as("w0"), lit(w(1)).as("w1"),
      lit(w(2)).as("w2"), lit(w(3)).as("w3"))
  }

  /** Score a corpus with the trained head: recompute the same quantized
    * features scan-side, broadcast the 1-row weight frame, emit the
    * hard-sigmoid probability and the >½ verdict. One scan, one
    * broadcast nested-loop join against a single row — no shuffle. */
  def logregScore(docs: DataFrame, weights: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    logregFeatures(docs, idCol, textCol)
      .crossJoin(broadcast(weights))
      .withColumn("z_ppm", col("w0") + col("w1") * col("x1") +
        col("w2") * col("x2") + col("w3") * col("x3"))
      .withColumn("p_ppm", expr("least(greatest((z_ppm + 2000000) div 4, 0), 1000000)"))
      .withColumn("pred", col("p_ppm") > 500000L)
      .select(col(idCol), col("x1"), col("x2"), col("x3"), col("y"),
        col("p_ppm"), col("pred"))

  /** Per-doc feature/label projection shared by [[logregFrame]] and
    * [[logregScore]] — defined once so train and score cannot drift. */
  private[graft] def logregFeatures(docs: DataFrame, idCol: String,
                                    textCol: String): DataFrame =
    docs.select(col(idCol),
      least(expr(s"length($textCol) div 64"), lit(15L)).as("x1"),
      least(expr(s"size(regexp_extract_all($textCol, '${TextAnalysis.bpePattern.replace("\\", "\\\\")}', 0)) div 32"),
        lit(15L)).cast("long").as("x2"),
      least(expr(s"(16 * size(regexp_extract_all($textCol, '[^A-Za-z0-9\\\\s]', 0))) div (length($textCol) + 1)"),
        lit(15L)).cast("long").as("x3"),
      when(col(textCol).contains(" the "), 1L).otherwise(0L).as("y"))

  // -------------------------------------------- embedding linear probe

  /** Per-component fixed-point quantization q(x) = floor(double(x)·qscale
    * + 0.5) — defined ONCE so train and score cannot drift. Double
    * promotion of the float is exact and the multiply/floor are single
    * IEEE ops, so any engine computes the identical integer. */
  private def quant(x: Column, qscale: Long): Column =
    floor(x.cast("double") * qscale.toDouble + 0.5).cast("long")

  /** Train the DIAGONAL linear probe (the DataComp-style quality head,
    * per-dimension independent least squares — a full d×d solve needs
    * driver-side linear algebra whose float pivots no SQL oracle can
    * replay; the diagonal approximation keeps every number exact
    * integer): over the labeled vectors,
    *
    *   w(j) = sign(Σ q(x_j)·y) · ((|Σ q(x_j)·y| · scale) div max(Σ q(x_j)², 1))
    *
    * with y ∈ {+1, -1}. The sign is extracted BEFORE the division:
    * Spark's `div` truncates toward zero while DuckDB's `//` floors, so
    * a negative numerator would round differently — dividing magnitudes
    * makes both engines agree. Returns the dim-length weight vector
    * (bounded: one long per dimension) for in-plan scoring. */
  def embeddingProbeWeights(labeled: DataFrame, dim: Int,
                            qscale: Long = 1024L, scale: Long = 1000000L,
                            vecCol: String = "embedding",
                            labelCol: String = "y"): Seq[Long] = {
    val per = labeled
      .select(col(labelCol).cast("long").as("_y"),
        posexplode(col(vecCol)).as(Seq("_j", "_x")))
      .select(col("_j"), (quant(col("_x"), qscale) * col("_y")).as("_qy"),
        (quant(col("_x"), qscale) * quant(col("_x"), qscale)).as("_qq"))
      .groupBy(col("_j"))
      .agg(sum(col("_qy")).as("num"), sum(col("_qq")).as("den"))
      .select(col("_j"),
        (signum(col("num")).cast("long") *
          expr(s"(abs(num) * $scale) div greatest(den, 1)")).as("w"))
    val w = new Array[Long](dim)
    // bounded collect: exactly `dim` rows (the model, not data)
    per.collect().foreach(r => w(r.getInt(0)) = r.getLong(1))
    w.toSeq
  }

  /** Score a corpus with the probe: one scan-side [[graft.expr.QuantDot]]
    * pass (weights in-plan, vectors never leave the scan), keep = score
    * above zero. */
  def embeddingProbeScore(corpus: DataFrame, weights: Seq[Long],
                          qscale: Long = 1024L, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
      graft.expr.Exprs.quantDot(col(vecCol), weights, qscale).as("score_fx"))
      .where(col("score_fx").isNotNull)
      .withColumn("keep", col("score_fx") > 0L)

  /** Exact ROC-AUC of an integer score against a boolean label — THE
    * calibration read on every quality/safety classifier this module
    * trains (is the score actually ranking positives above negatives?).
    * AUC equals the Mann–Whitney statistic
    *
    *   AUC = (#(pos > neg) + ½·#(pos == neg)) / (n_pos · n_neg)
    *
    * computed EXACTLY without materializing pairs: group rows by score,
    * order the score alphabet ascending, and fold
    *
    *   wins = Σ_s n_pos(s) · cum_neg(< s),   ties = Σ_s n_pos(s)·n_neg(s)
    *   auc_ppm = 10⁶·(2·wins + ties) div (2·n_pos·n_neg)
    *
    * — every operand non-negative (Spark div == DuckDB //), products
    * routed through decimal(38,0). Rows with a NULL score or label are
    * excluded from ranking but surfaced in `n_excluded` (the
    * malformed-rows rule); a degenerate input (no positives or no
    * negatives) reads NULL auc, not a fabricated ½.
    *
    * Shape at scale: ONE map-side-combined groupBy to the score
    * alphabet (integer scores — ppm-quantized scores bound this at 10⁶
    * +1 rows), one alphabet-bounded running-sum window, one final fold
    * to a single row. The corpus is scanned once; nothing pairwise
    * ever materializes. The ppm ratio is derived from the DECIMAL
    * win/tie sums — never from the long-cast audit columns — so it
    * stays exact at any scale; the reported `wins`/`ties` columns are
    * best-effort BIGINT audit values (n_pos·n_neg < 2⁶³ holds to
    * ~3·10⁹ balanced rows; beyond that they read NULL under non-ANSI
    * decimal→long overflow while auc_ppm stays correct). */
  def rocAuc(scored: DataFrame, scoreCol: String = "score_ppm",
             labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = scored.select(col(scoreCol).cast("long").as("_s"),
      col(labelCol).cast("boolean").as("_y"))
    val bad = col("_s").isNull || col("_y").isNull
    val g = rows.groupBy(when(bad, lit(null).cast("long"))
        .otherwise(col("_s")).as("s"))
      .agg(sum(when(!bad && col("_y"), 1L).otherwise(0L)).as("np"),
        sum(when(!bad && !col("_y"), 1L).otherwise(0L)).as("nn"),
        sum(when(bad, 1L).otherwise(0L)).as("nx"))
    // the NULL-score group carries np = nn = 0, so its window position
    // contributes nothing to cum_nn and the fold below
    val w = Window.orderBy(col("s").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("nx")).as("n_excluded"),
        sum(col("np").cast("decimal(38,0)") * col("cum_nn")).as("_w"),
        sum(col("np").cast("decimal(38,0)") * col("nn")).as("_t"))
      .select(
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_neg"), lit(0L)).as("n_neg"),
        coalesce(col("n_excluded"), lit(0L)).as("n_excluded"),
        coalesce(col("_w"), lit(0)).cast("decimal(38,0)").as("_wd"),
        coalesce(col("_t"), lit(0)).cast("decimal(38,0)").as("_td"))
      .withColumn("auc_ppm", expr(
        """case when n_pos > 0 and n_neg > 0 then
          |  cast((1000000 * (2 * _wd + _td))
          |    div (2 * cast(n_pos as decimal(38,0)) * n_neg) as bigint)
          |end""".stripMargin))
      .select(col("n_pos"), col("n_neg"), col("n_excluded"),
        col("_wd").cast("long").as("wins"), col("_td").cast("long").as("ties"),
        col("auc_ppm"))
  }

  /** Per-group ROC-AUC — [[rocAuc]] partitioned by a group column (the
    * per-source calibration read: a classifier can rank well globally
    * while inverting inside one source, and the mixture weights hide
    * it). Same Mann–Whitney fold, same NULL/degenerate semantics, one
    * row per group; a group whose rows are all one class reads NULL
    * auc with its counts intact, and a NULL group value forms its own
    * surfaced row. The running-sum window partitions by group, so the
    * alphabet bound is per group, not global. */
  def rocAucBy(scored: DataFrame, groupCol: String,
               scoreCol: String = "score_ppm",
               labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = scored.select(col(groupCol).as("_g"),
      col(scoreCol).cast("long").as("_s"),
      col(labelCol).cast("boolean").as("_y"))
    val bad = col("_s").isNull || col("_y").isNull
    val g = rows.groupBy(col("_g"),
        when(bad, lit(null).cast("long")).otherwise(col("_s")).as("s"))
      .agg(sum(when(!bad && col("_y"), 1L).otherwise(0L)).as("np"),
        sum(when(!bad && !col("_y"), 1L).otherwise(0L)).as("nn"),
        sum(when(bad, 1L).otherwise(0L)).as("nx"))
    val w = Window.partitionBy(col("_g"))
      .orderBy(col("s").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("_g").as(groupCol))
      .agg(
        coalesce(sum(col("np")), lit(0L)).as("n_pos"),
        coalesce(sum(col("nn")), lit(0L)).as("n_neg"),
        coalesce(sum(col("nx")), lit(0L)).as("n_excluded"),
        coalesce(sum(col("np").cast("decimal(38,0)") * col("cum_nn")),
          lit(0)).cast("decimal(38,0)").as("_wd"),
        coalesce(sum(col("np").cast("decimal(38,0)") * col("nn")),
          lit(0)).cast("decimal(38,0)").as("_td"))
      .withColumn("auc_ppm", expr(
        """case when n_pos > 0 and n_neg > 0 then
          |  cast((1000000 * (2 * _wd + _td))
          |    div (2 * cast(n_pos as decimal(38,0)) * n_neg) as bigint)
          |end""".stripMargin))
      .select(col(groupCol), col("n_pos"), col("n_neg"), col("n_excluded"),
        col("_wd").cast("long").as("wins"), col("_td").cast("long").as("ties"),
        col("auc_ppm"))
  }
}
