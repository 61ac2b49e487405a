package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", §4): score every document by how surprising its token
  * sequence is under an n-gram LM trained on a target corpus ("looks
  * like Wikipedia"), then split the corpus into head / middle / tail
  * perplexity buckets — the standard pre-training quality tiers.
  *
  * Deviations from the paper, both deliberate and both following the
  * engine-exactness discipline of [[Importance]] (DSIR):
  *
  *   - the LM is an add-one-smoothed hashed-bigram model, not KenLM's
  *     5-gram Kneser-Ney: unigram and bigram counts hash into `buckets`
  *     slots, so BOTH model tables are at most `buckets` rows and
  *     broadcast at any corpus size (a real KenLM table would need a
  *     shuffle join against every token position);
  *   - per-position "surprisal" is the INTEGER ratio
  *     `(scale*(c_uni(a) + V)) div (c_big(a,b) + 1)` ∝ 1/P(b|a) — a
  *     per-document score is then a sum of longs, bit-identical across
  *     engines where KenLM's float log-sum would drift in the last ulp
  *     under different reduction orders. The log-domain view the paper
  *     buckets on is preserved as `log2_sum` = Σ floor(log2(ratio)),
  *     computed EXACTLY in integers via binary-string length (Spark
  *     `conv(x,10,2)`, DuckDB `bin(x)` — both emit minimal binary), so
  *     the oracle reproduces it digit-for-digit.
  *
  * Bucketing is by VALUE thresholds, as in the paper (CCNet computes
  * perplexity cutoffs once and assigns every doc below the cutoff to
  * head): t1/t2 are the smallest mean-surprisal values whose cumulative
  * doc count reaches ceil(n/3) and ceil(2n/3). Scale shape: thresholds
  * come from a groupBy(mean) histogram plus one window over the
  * DISTINCT integer means (a narrow frame far smaller than the corpus
  * — integer scores collapse heavily), broadcast back as a 1-row
  * cross join — no global row_number sort over the corpus, which is
  * what a rank-based tertile would cost at 10^12 docs.
  *
  * Documents with fewer than two tokens have no bigrams and are
  * dropped, the same no-evidence rule as [[Importance.dsirScore]].
  */
object Perplexity {

  private val P = 1000000007L

  /** Per-token polynomial values (the [[Importance.bigramBuckets]] /
    * fingerprint term): `len·131 + first-codepoint mod P`. Cross-engine
    * note: Spark 4's `ascii()` returns the full Unicode CODEPOINT of
    * the first character (probe: ascii('é')=233, ascii('中')=20013 —
    * pinned in TextAnalysisSpec's non-ASCII regression), which is
    * exactly DuckDB's `ascii()` semantics, so the q130/q131 oracles
    * compute identical buckets on non-ASCII-leading tokens. The
    * "first-UTF-8-byte" behavior a reader might expect from the
    * function name does not exist on either engine. */
  private def tokenValues(text: Column): Column =
    transform(TextAnalysis.tokens(text),
      t => (length(t).cast("long") * 131L + ascii(substring(t, 1, 1)).cast("long")) % P)

  /** Adjacent-pair features: one struct per bigram position with the
    * context's unigram bucket `ua` and the pair's bigram bucket `bb`
    * (q110 gram fold `a·31 + b mod P`, then mod `buckets` — the same
    * bigram key as [[Importance.bigramBuckets]]). */
  private def pairFeatures(text: Column, buckets: Int): Column = {
    val tv = tokenValues(text)
    val n1 = greatest(size(tv) - 1, lit(0))
    zip_with(slice(tv, lit(1), n1), slice(tv, lit(2), n1),
      (a, b) => struct((a % buckets).as("ua"), (((a * 31L + b) % P) % buckets).as("bb")))
  }

  /** floor(log2(x)) for x >= 1 (0 for x = 0), exact in integers: the
    * minimal binary representation's length minus one. Mirrors DuckDB
    * `length(bin(x)) - 1`. */
  private def ilog2(x: Column): Column =
    length(conv(x.cast("string"), 10, 2)).cast("long") - 1L

  /** The two broadcastable LM tables from a target corpus: unigram
    * bucket counts (<= buckets rows) and bigram bucket counts
    * (<= buckets rows). */
  def lmCounts(target: DataFrame, buckets: Int = 4096,
               textCol: String = "text"): (DataFrame, DataFrame) = {
    val tv = tokenValues(col(textCol))
    val uni = target.select(explode(transform(tv, v => v % buckets)).as("ua"))
      .groupBy("ua").agg(count(lit(1)).as("cu"))
    val big = target.select(explode(pairFeatures(col(textCol), buckets)).as("f"))
      .groupBy(col("f.bb").as("bb")).agg(count(lit(1)).as("cb"))
    (uni, big)
  }

  /** Persist a trained LM (both count tables + a meta row pinning
    * `buckets`/`scale`) — the production shape: CCNet trains its target
    * LM ONCE and scores every corpus shard against it; retraining per
    * job would rescan the target at every call site. Same discipline as
    * the persisted IVF/minhash indexes. */
  def saveLm(target: DataFrame, path: String, buckets: Int = 4096,
             scale: Long = 10000L, textCol: String = "text"): Unit = {
    val (uni, big) = lmCounts(target, buckets, textCol)
    uni.coalesce(1).write.mode("overwrite").parquet(s"$path/uni")
    big.coalesce(1).write.mode("overwrite").parquet(s"$path/big")
    val spark = target.sparkSession
    import spark.implicits._
    Seq((buckets, scale)).toDF("buckets", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Score a corpus against a persisted LM — reads the bounded count
    * tables (≤ buckets rows each) and the pinned meta, then runs the
    * same broadcast-join scoring pass as [[lmScore]]. */
  def lmScoreFromIndex(corpus: DataFrame, path: String,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       keep: Seq[String] = Nil): DataFrame = {
    val spark = corpus.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val buckets = meta.getAs[Int]("buckets")
    val scale = meta.getAs[Long]("scale")
    scoreWith(corpus, spark.read.parquet(s"$path/uni"),
      spark.read.parquet(s"$path/big"), buckets, scale, idCol, textCol, keep)
  }

  /** Per-document LM scores against the target: `surprisal_sum` (Σ of
    * the integer inverse-probability ratios), `log2_sum` (Σ of their
    * exact integer log2s — the log-domain perplexity proxy the paper
    * buckets on), `n_bigrams`, and `avg_surprisal` = sum div count. */
  def lmScore(corpus: DataFrame, target: DataFrame, buckets: Int = 4096,
              scale: Long = 10000L, idCol: String = "doc_id",
              textCol: String = "text", keep: Seq[String] = Nil): DataFrame = {
    val (uni, big) = lmCounts(target, buckets, textCol)
    scoreWith(corpus, uni, big, buckets, scale, idCol, textCol, keep)
  }

  /** `keep`: extra per-document columns carried THROUGH the scoring
    * aggregation (grouped alongside the id they are functionally
    * dependent on — they ride the same shuffle for free). Lets a
    * composed pipeline (q131) keep its doc metadata on the scored
    * frame instead of joining back to an expensive upstream subtree
    * (r18, guide §2.4: that join re-derived the whole span-dedup
    * stage). */
  private def scoreWith(corpus: DataFrame, uni: DataFrame, big: DataFrame,
                        buckets: Int, scale: Long, idCol: String,
                        textCol: String, keep: Seq[String] = Nil): DataFrame = {
    val r = expr(
      s"($scale * (coalesce(cu, 0) + $buckets)) DIV (coalesce(cb, 0) + 1)")
      .cast("long")
    val keyCols = col(idCol) +: keep.map(col)
    corpus.select(keyCols :+ explode(pairFeatures(col(textCol), buckets)).as("f"): _*)
      .select(keyCols ++ Seq(col("f.ua").as("ua"), col("f.bb").as("bb")): _*)
      .join(broadcast(uni), Seq("ua"), "left")
      .join(broadcast(big), Seq("bb"), "left")
      .select(keyCols :+ r.as("r"): _*)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("r")).as("surprisal_sum"),
        sum(ilog2(col("r"))).as("log2_sum"))
      .withColumn("avg_surprisal", expr("surprisal_sum DIV n_bigrams"))
  }

  /** Exact cumulative count along the value order of a histogram frame
    * `(valueCol, cntCol)`, with every sort BOUNDED (the round-8 verdict
    * watch-item: a bare `Window.orderBy(value)` funnels all distinct
    * values through ONE task — fine while integer means collapse, a
    * single-partition sort when an adversary spreads them one-per-doc).
    * The [[Curate.epochShuffle]] discipline, kept in-plan: range-
    * partition by value so partition order == value order and each
    * partition holds ~|distinct|/parts rows, take per-partition totals
    * (≤ `parts` rows — the only global window runs over THAT), then
    * broadcast the partition offsets back onto a partition-local
    * cumsum. Row-identical to the direct global window, which is what
    * the q130/q131 oracles keep asserting. */
  private[graft] def cumulativeByValue(dist: DataFrame, valueCol: String,
                                     cntCol: String,
                                     parts: Int = 32): DataFrame = {
    val ranged = dist.repartitionByRange(parts, col(valueCol))
      .withColumn("_pid", spark_partition_id().cast("long"))
    val perPart = ranged.groupBy("_pid").agg(sum(col(cntCol)).as("_psum"))
    // exclusive prefix over <= parts partition totals — bounded by the
    // constant `parts`, never by the data
    val offW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perPart
      .withColumn("_off", coalesce(sum(col("_psum")).over(offW), lit(0L)))
      .select(col("_pid"), col("_off"))
    val localW = Window.partitionBy(col("_pid")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("_lcum", sum(col(cntCol)).over(localW))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("_cum", col("_lcum") + col("_off"))
      .drop("_pid", "_lcum", "_off")
  }

  /** End-to-end CCNet tiers: score the corpus against the target and
    * assign head / middle / tail by the value thresholds t1/t2 (the
    * smallest mean surprisals reaching ceil(n/3) and ceil(2n/3)
    * cumulative docs). head = most target-like (lowest surprisal). */
  def perplexityBuckets(corpus: DataFrame, target: DataFrame,
                        buckets: Int = 4096, scale: Long = 10000L,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        keep: Seq[String] = Nil): DataFrame = {
    // scored is read by the histogram chain AND the final assignment —
    // persist the narrow (id + 4 longs) frame so the corpus text is
    // scanned and the LM join paid ONCE (Verify/Bench clear the cache
    // between queries; long-lived callers own the unpersist, the
    // Dedup.minhashIndex discipline)
    val scored = lmScore(corpus, target, buckets, scale, idCol, textCol, keep)
      .persist()
    valueTertiles(scored, "avg_surprisal", "ppl_bucket", "head", "middle", "tail")
      .select(col(idCol) +: keep.map(col) ++: Seq(col("n_bigrams"),
        col("surprisal_sum"), col("log2_sum"), col("avg_surprisal"),
        col("ppl_bucket")): _*)
  }

  /** VALUE-threshold tertile tagging (the CCNet cutoff rule, shared with
    * [[QualityModel]]): t1/t2 are the smallest values of `valueCol` whose
    * cumulative row count reaches ceil(n/3) and ceil(2n/3); rows tag
    * `lowLabel`/`midLabel`/`highLabel` in ASCENDING value order, and rows
    * sharing one value always share one tag. Thresholds derive from the
    * distinct-value histogram through [[cumulativeByValue]] (every sort
    * bounded) and come back as a broadcast 1-row cross join — the corpus
    * is never sorted or re-shuffled. */
  private[graft] def valueTertiles(scored: DataFrame, valueCol: String,
                                   outCol: String, lowLabel: String,
                                   midLabel: String,
                                   highLabel: String): DataFrame =
    tagTertiles(scored, tertileThresholds(scored, valueCol), valueCol,
      outCol, lowLabel, midLabel, highLabel)

  /** The 1-row (_t1, _t2) threshold frame behind [[valueTertiles]] —
    * exposed separately so a production pipeline can compute cutoffs
    * ONCE (CCNet trains its LM and fixes its perplexity cutoffs on a
    * reference corpus, then applies them to every shard/stream) and
    * persist them alongside the LM. */
  private[graft] def tertileThresholds(scored: DataFrame,
                                       valueCol: String): DataFrame = {
    val dist = scored.groupBy(valueCol).agg(count(lit(1)).as("_c"))
    val cum = cumulativeByValue(dist, valueCol, "_c")
    val nRow = dist.agg(sum(col("_c")).as("_n"))
    cum.crossJoin(broadcast(nRow)).agg(
      min(when(col("_cum") >= expr("(_n + 2) DIV 3"), col(valueCol))).as("_t1"),
      min(when(col("_cum") >= expr("(2 * _n + 2) DIV 3"), col(valueCol))).as("_t2"))
  }

  /** Tag rows against a FIXED 1-row (_t1, _t2) threshold frame. */
  private[graft] def tagTertiles(scored: DataFrame, thresholds: DataFrame,
                                 valueCol: String, outCol: String,
                                 lowLabel: String, midLabel: String,
                                 highLabel: String): DataFrame =
    scored.crossJoin(broadcast(thresholds))
      .withColumn(outCol,
        when(col(valueCol) <= col("_t1"), lowLabel)
          .when(col(valueCol) <= col("_t2"), midLabel)
          .otherwise(highLabel))
      .drop("_t1", "_t2")
}
