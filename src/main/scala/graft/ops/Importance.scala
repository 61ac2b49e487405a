package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR — Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS '23): score every raw document by how much more likely its
  * hashed n-gram features are under a (small) target corpus than under
  * the raw corpus, then keep the top-weighted documents. This is the
  * standard way to tilt a 100 TB crawl toward a quality/domain target
  * (e.g. "looks like curated encyclopedic text") without a model in the
  * loop.
  *
  * Deviations from the paper, both deliberate:
  *   - weights are INTEGER ratio buckets `(scale·(ct+1)) div (cr+1)`
  *     rather than log-space floats: a per-document score is then a sum
  *     of longs — associativity-free and bit-identical across engines
  *     (the same "rational idf" discipline as [[TextAnalysis.tfidfTopTerms]]),
  *     where a float log-sum would diverge in the last ulp under
  *     Spark's vs DuckDB's reduction orders;
  *   - selection is deterministic top-k by mean bigram weight (ties to
  *     the lowest doc_id) rather than Gumbel-noised sampling — the same
  *     retry-stability argument as every sampler in [[Curate]] (md5
  *     coins, no rand()); a caller who wants the paper's sampled
  *     variant can jitter with [[Curate.hashSample]]'s coin on top.
  *
  * Scale shape: the weight table is at most `buckets` rows (fits in a
  * broadcast at any corpus size — that cap is the whole point of hashed
  * features); building it is one scan over raw + one over target with
  * map-side-combinable counts; scoring is one more corpus scan, a
  * broadcast join, and a partial-aggregated groupBy(doc_id); the final
  * top-k is TakeOrdered (no global sort materializes). Nothing in the
  * plan holds state proportional to corpus size.
  */
object Importance {

  private val P = 1000000007L

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS '23):
    * iteratively upweight the domains with EXCESS loss over the current
    * mixture's average, and output the AVERAGE weights across rounds
    * (the paper's deliverable — the averaged Group-DRO iterate, not the
    * final one). Deviations, both deliberate and documented:
    *
    *   - the exponentiated-gradient update exp(η·excess) is replaced by
    *     the (1 + η·excess) multiplicative-weights variant (Arora,
    *     Hazan & Kale, "The Multiplicative Weights Update Method",
    *     Theory of Computing 2012 — their canonical algorithm IS this
    *     linearized form): exp(·) has no exact integer cross-engine
    *     replay, the linear form is closed under ppm arithmetic, and
    *     for small η·excess they agree to first order;
    *   - the per-domain loss is a DATA-DERIVED proxy — the source's
    *     mean type-token ratio in ppm (lexical diversity as hardness;
    *     the proxy-model/reference-model pair the paper trains is out
    *     of scope for a data engine) — so the whole dynamic is
    *     replayable from the corpus alone. Any per-source integer
    *     loss column can be swapped in.
    *
    * Excess clips at 0 (the paper's rectification), every division has
    * positive operands (floors == truncation), and products route
    * through decimal(38,0). Shape at scale: ONE corpus scan builds the
    * per-source (n_docs, loss) frame — bounded by the source alphabet —
    * and each of the `iters` rounds is one broadcast of the 1-row
    * mixture average plus arithmetic over that frame, checkpointed so
    * the plan never nests; iteration cost is corpus-independent.
    * Output: (source, n_docs, loss_ppm, alpha_ppm, alpha_avg_ppm). */
  def doremiWeights(docs: DataFrame, sourceCol: String = "source",
                    textCol: String = "text", iters: Int = 8,
                    lrNum: Long = 16L): DataFrame = {
    require(iters >= 1 && lrNum > 0)
    val loss = docs
      .select(col(sourceCol).as("source"),
        expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x <> '')").as("_tk"))
      .select(col("source"), expr(
        "(1000000 * size(array_distinct(_tk))) div greatest(size(_tk), 1)")
        .cast("long").as("_ttr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_ttr")).as("_st"))
      .select(col("source"), col("n_docs"),
        expr("_st div n_docs").cast("long").as("loss_ppm"))
      .transform(graft.plans.CheckpointAudit.local)
    // bounded scalar read: the domain-alphabet size (one long), not data
    val nS = loss.count().max(1L)
    var a = loss.select(col("source"),
      lit(1000000L / nS).as("alpha"),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)").as("asum"))
    for (_ <- 1 to iters) {
      val withLoss = a.join(loss.select(col("source"), col("loss_ppm")), Seq("source"))
      val mix = withLoss
        .agg(expr("sum(cast(alpha as decimal(38,0)) * loss_ppm) div 1000000")
          .as("mixbar"))
      val am = withLoss.crossJoin(broadcast(mix))
        .withColumn("_am", expr(
          s"cast(alpha as decimal(38,0)) * (1000000 + $lrNum * greatest(loss_ppm - mixbar, 0))"))
      val tot = am.agg(sum(col("_am")).as("_tot"))
      a = am.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("cast((1000000 * _am) div _tot as bigint)").as("alpha"),
          expr("cast(asum + (1000000 * _am) div _tot as decimal(38,0))").as("asum"))
        .transform(graft.plans.CheckpointAudit.local)
    }
    loss.join(a, Seq("source"))
      .select(col("source"), col("n_docs"), col("loss_ppm"), col("alpha").as("alpha_ppm"),
        expr(s"cast(asum div $iters as bigint)").as("alpha_avg_ppm"))
  }

  /** Hashed word-bigram feature buckets of a text column. Per-token
    * value is [[TextAnalysis.fingerprint]]'s per-token term
    * (`len·131 + first-codepoint`, engine-neutral and non-negative);
    * adjacent pairs fold with the q110 gram rule (`a·31 + b mod P`) and
    * land in `buckets` hash buckets. Collisions are intrinsic to DSIR
    * (the paper's hashed n-grams) — they only smooth the weight
    * estimate. Documents under two tokens yield an empty array.
    * `ascii()` here is full-codepoint on BOTH engines (Spark 4 probe
    * ascii('é')=233 == DuckDB — pinned in TextAnalysisSpec), so the
    * fold is engine-exact on non-ASCII-leading tokens too. */
  def bigramBuckets(text: Column, buckets: Int): Column = {
    val tv = transform(TextAnalysis.tokens(text),
      t => (length(t).cast("long") * 131L + ascii(substring(t, 1, 1)).cast("long")) % P)
    val n1 = greatest(size(tv) - 1, lit(0))
    zip_with(slice(tv, lit(1), n1), slice(tv, lit(2), n1),
      (a, b) => ((a * 31L + b) % P) % buckets)
  }

  /** Per-bucket importance weights `(scale·(ct+1)) div (cr+1)` from raw
    * and target bigram-bucket counts (add-one smoothed; integer DIV).
    * `scale` is the neutral weight: a bucket equally frequent in both
    * corpora scores ≈ scale. At most `buckets` rows — broadcastable. */
  def dsirWeights(raw: DataFrame, target: DataFrame, buckets: Int = 4096,
                  scale: Long = 10000L, textCol: String = "text"): DataFrame = {
    val f = (df: DataFrame) =>
      df.select(explode(bigramBuckets(col(textCol), buckets)).as("bucket"))
    val cr = f(raw).groupBy("bucket").agg(count(lit(1)).as("cr"))
    val ct = f(target).groupBy("bucket").agg(count(lit(1)).as("ct"))
    cr.join(ct, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
      .withColumn("w", expr(s"($scale * (ct + 1)) DIV (cr + 1)"))
  }

  /** Per-document importance scores against a prebuilt weight table:
    * `score` = Σ bucket weights over the document's bigrams (long-exact),
    * `avg_w` = score div n_bigrams (length-normalized, so selection
    * does not simply favor long documents). Buckets absent from the
    * table score the neutral `scale`. Documents with fewer than two
    * tokens have no features and are dropped — they carry no evidence
    * either way; filter them with [[TextAnalysis.tokenStats]] upstream
    * if they must be ruled on. */
  def dsirScore(corpus: DataFrame, weights: DataFrame, buckets: Int = 4096,
                scale: Long = 10000L, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    corpus.select(col(idCol), explode(bigramBuckets(col(textCol), buckets)).as("bucket"))
      .join(broadcast(weights.select(col("bucket"), col("w"))), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("w"), lit(scale))).as("score"))
      .withColumn("avg_w", expr("score DIV n_bigrams"))

  /** End-to-end DSIR selection: weight on (raw=corpus, target), score
    * the corpus, keep the k documents with the highest mean bigram
    * weight (ties to the lowest id). Two corpus scans + one target scan
    * + a broadcast join; top-k is TakeOrdered. */
  def dsirResample(corpus: DataFrame, target: DataFrame, k: Int,
                   buckets: Int = 4096, scale: Long = 10000L,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = dsirWeights(corpus, target, buckets, scale, textCol)
    dsirScore(corpus, w, buckets, scale, idCol, textCol)
      .orderBy(col("avg_w").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact integer WATERFILLING token-budget allocation — the "data
    * recipe" solver: given a total training-token budget and what each
    * source actually has, give every source an equal share EXCEPT that
    * no source is asked for more than it has; freed-up share
    * redistributes to the bigger sources (the classic waterfill level,
    * and the balanced-mixture counterpart to [[doremiWeights]]'
    * loss-tilted weights — LLaMA-style recipes are exactly such a
    * table of per-source allocations/epochs). Distinct from
    * [[Curate.epochAllocate]], the √T-weighted MULTI-epoch planner
    * (allocations there may exceed availability up to maxEpochs; its
    * level is a weighted λ and its total is ≤ budget): THIS op is the
    * single-epoch equal-share form whose remainder rule makes
    * Σ alloc == budget EXACT — the two ends of the recipe spectrum.
    *
    * Exact in integers, deterministic: sources sort by (avail ASC,
    * source ASC); a PREFIX of that order saturates (gives all it has)
    * — row i saturates iff avail_i·(k−i+1) + prefix_{i−1} ≤ budget,
    * ANDed down the prefix (a window min, no recursion needed since
    * the order is ascending); the unsaturated rest each get
    * level = B′ div u, and the B′ mod u remainder goes one token each
    * to the FIRST r unsaturated sources in the same order, so
    * Σ alloc == budget EXACTLY (spec-pinned). All divisions on
    * non-negative operands (div/floor parity is free).
    *
    * Shape at scale: ONE map-side-combined per-source token
    * aggregation; everything after runs on the source-alphabet-bounded
    * frame (windows over ≤ |sources| rows). */
  def waterfillAllocation(docs: DataFrame, budgetPpm: Long = 500000L,
                          sourceCol: String = "source",
                          textCol: String = "text"): DataFrame = {
    val avail = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("avail"))
      .where(col("avail") > 0)
    waterfillOver(avail, budgetPpm)
  }

  /** The waterfill core over an arbitrary BOUNDED (source, avail) frame
    * — shared by the token-recipe form ([[waterfillAllocation]]) and
    * the cluster-budget coreset (q211). See [[waterfillAllocation]] for
    * the algorithm contract. */
  private[ops] def waterfillOver(avail: DataFrame,
                                 budgetPpm: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetPpm >= 0 && budgetPpm <= 1000000L,
      "budgetPpm is a fraction of the corpus in ppm")
    val ord = Window.orderBy(col("avail").asc, col("source").asc)
    val all = Window.partitionBy(lit(1))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upto = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    avail
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("total", sum(col("avail")).over(all))
      .withColumn("budget", expr(s"(total * ${budgetPpm}L) div 1000000"))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("prefix", coalesce(sum(col("avail")).over(pre), lit(0L)))
      .withColumn("cond",
        when(col("avail") * (col("k") - col("i") + 1L) + col("prefix")
          <= col("budget"), 1L).otherwise(0L))
      .withColumn("saturated", min(col("cond")).over(upto) === 1L)
      .withColumn("sat_sum", sum(when(col("saturated"), col("avail"))
        .otherwise(0L)).over(all))
      .withColumn("n_unsat", col("k") -
        sum(when(col("saturated"), 1L).otherwise(0L)).over(all))
      .withColumn("rank_unsat",
        sum(when(col("saturated"), 0L).otherwise(1L)).over(upto))
      .withColumn("alloc_tokens",
        when(col("saturated"), col("avail")).otherwise(
          expr("(budget - sat_sum) div n_unsat") +
            when(col("rank_unsat") <= (col("budget") - col("sat_sum"))
              % col("n_unsat"), 1L).otherwise(0L)))
      .withColumn("epochs_ppm", expr("(alloc_tokens * 1000000) div avail"))
      .select(col("source"), col("avail").as("avail_tokens"),
        col("alloc_tokens"), col("saturated"), col("epochs_ppm"))
  }
}
