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
}
