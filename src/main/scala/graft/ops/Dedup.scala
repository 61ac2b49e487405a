package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each designed
  * around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-groupBy on a 64-bit content hash (map-side combine,
  *    shuffle carries (hash, min_id, count) only — never the text).
  *  - MinHash + LSH: per-doc signature (narrow, scan-side) -> explode to
  *    (band, bandHash) keys -> self-join *within buckets only*. The
  *    candidate-pair space is |bucket|², not |corpus|²; band count and
  *    rows-per-band tune the jaccard threshold curve.
  *  - SimHash: 64-bit signature per doc; candidates = docs sharing any of
  *    4 16-bit blocks (exact-match buckets, same bucket-join shape).
  *  - verification: exact n-gram jaccard / hamming on candidate pairs only.
  *
  * All signatures use xxhash64 (codegen'd Catalyst expression) — these
  * operators are validated by ScalaTest with planted near-duplicates, not
  * the SQL oracle (cross-engine hash equality is not a goal).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest doc_id per identical text. Output one
    * row per distinct text with its survivor id and duplicate count. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select(col("doc_id"), col("dup_cnt"))

  // -------------------------------------------------------------- shingles

  /** Word n-gram shingles of normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct 64-bit shingle hashes per document. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

  // --------------------------------------------------------------- minhash

  /** Deterministic affine permutation parameters (public LSH construction:
    * h_i(x) = (a_i*x + b_i) mod p — Broder '97 min-wise hashing). */
  private val P = 2305843009213693951L // 2^61 - 1, Mersenne prime
  private def perms(k: Int): Seq[(Long, Long)] =
    (1 to k).map(i => (2L * i * 1103515245L + 12345L | 1L, i * 134775813L + 1L))

  /** k-element MinHash signature column over distinct shingle hashes. */
  def minhashSignature(text: Column, k: Int = 32, n: Int = 3): Column = {
    val hs = shingleHashes(text, n)
    array(perms(k).map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(P))))
    }: _*)
  }

  /** Candidate near-duplicate pairs via banded LSH over the signature.
    * bands*rowsPerBand must equal the signature length; the match
    * probability for jaccard j is 1-(1-j^rows)^bands. */
  def minhashCandidates(documents: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
                        n: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    val sig = documents.select(col("doc_id"),
      minhashSignature(col("text"), k, n).as("sig"))
    val banded = sig.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string")))))))
      .toDF("doc_id", "band", "band_hash")
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact jaccard verification of candidate pairs; keeps pairs >= tau.
    * Joins the (small) candidate set back to the shingle arrays — at scale
    * this join is broadcast when candidates fit, shuffled-hash otherwise. */
  def minhashDuplicates(documents: DataFrame, tau: Double = 0.7,
                        bands: Int = 8, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val sh = documents.select(col("doc_id"), shingleHashes(col("text"), n).as("sh"))
    val cand = minhashCandidates(documents, bands, rowsPerBand, n)
    cand
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Dedup survivors under MinHash: drop every doc that near-duplicates a
    * smaller doc_id (greedy cluster representative = min id). */
  def minhashSurvivors(documents: DataFrame, tau: Double = 0.7): DataFrame = {
    val dropIds = minhashDuplicates(documents, tau).select(col("doc_b").as("doc_id")).distinct()
    documents.join(dropIds, Seq("doc_id"), "left_anti")
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash over token hashes (Charikar '02): bit b of the
    * signature is the sign of sum over tokens of (+1 if hash bit b else -1).
    * Computed per-row with higher-order functions — no explode, no shuffle. */
  def simhash(text: Column): Column = {
    val hs = transform(TextAnalysis.tokens(lower(text)), t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => {
        val votes = aggregate(hs, lit(0L),
          (v, h) => v + when(call_function("shiftright", h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        acc.bitwiseOR(when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L))
      })
  }

  private def popcount64(c: Column): Column =
    bit_count(c)

  /** Near-duplicate pairs by SimHash: candidates share one of `blocks`
    * equal bit-blocks (pigeonhole: any pair within hamming distance
    * blocks-1 shares a block), verified with exact hamming <= maxHamming. */
  def simhashDuplicates(documents: DataFrame, maxHamming: Int = 3, blocks: Int = 4): DataFrame = {
    val width = 64 / blocks
    val mask = (1L << width) - 1
    val sig = documents.select(col("doc_id"), simhash(col("text")).as("sig"))
    val blocked = sig.select(col("doc_id"), col("sig"), posexplode(
      transform(sequence(lit(0), lit(blocks - 1)),
        b => call_function("shiftright", col("sig"), b * width).bitwiseAND(mask))))
      .toDF("doc_id", "sig", "block", "block_val")
    blocked.as("l").join(blocked.as("r"),
        col("l.block") === col("r.block") &&
        col("l.block_val") === col("r.block_val") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        popcount64(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicates: pairs above `minCos`. Candidate
    * generation reuses Similarity's hyperplane-LSH buckets so the pair
    * space stays sub-quadratic; exact cosine verifies. */
  def embeddingDuplicates(embeddings: DataFrame, minCos: Double = 0.95,
                          planes: Int = 12): DataFrame = {
    val bucketed = Similarity.withBucket(embeddings, "embedding", planes)
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        Similarity.cosine(col("l.embedding"), col("r.embedding")).as("cos"))
      .where(col("cos") >= minCos)
  }
}
