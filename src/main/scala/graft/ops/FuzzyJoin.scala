package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string join (entity resolution): pairs whose names are within a
  * Levenshtein distance budget, WITHOUT the |L|x|R| distance matrix. A
  * raw `levenshtein(l, r) <= k` join is a nested-loop over every pair —
  * dead at warehouse scale. Decomposition:
  *
  *   1. candidates: explode distinct lowercase tokens of each name and
  *      equi-join on the token — any pair within a small edit budget of
  *      multi-token strings leaves >= 1 token untouched, so token overlap
  *      is (practically) complete for k << token length; stopword-like
  *      tokens are df-capped exactly like ngramJaccardPairs' postings
  *      (a token in f names contributes f^2 candidate rows otherwise);
  *   2. verify: exact levenshtein on the (small) candidate set only.
  *
  * Cost scales with token-collision density, not |L|x|R|; every step is
  * an equi-keyed shuffle. For SINGLE-token names use [[joinQgram]] —
  * word-token postings can't work when one edit touches the only token.
  */
object FuzzyJoin {

  /** Candidate pairs for [[join]] — exposed separately so candidate volume
    * is observable (count this frame to audit pruning; at warehouse scale,
    * candidate blow-up is THE failure mode of postings joins, and a lazy
    * plan can't warn from inside itself).
    *
    * Three prunes, applied postings-first:
    *   - df cap with a corpus-relative slope: tokens with df above
    *     `max(maxDf, maxDfRatio × totalRows)` are dropped from the
    *     postings (a token in f rows contributes f² join rows). The
    *     absolute floor protects small and low-vocabulary corpora — on
    *     those, EVERY shared token clears any ratio that fires, so a
    *     relative-only cap is recall death, which is exactly why the
    *     low-vocab degeneracy is solved by `minSharedTokens` below and
    *     NOT by tightening this cap. The ratio term keeps the guard from
    *     discarding merely-common (sub-stopword) tokens on corpora ≫
    *     `maxDf` rows.
    *   - length band: `|len(l) − len(r)| ≤ maxDist` right on the postings
    *     join output — levenshtein is bounded below by the length gap, so
    *     this is EXACT pruning, before the pair-dedup shuffle pays for the
    *     pair.
    *   - (measured and rejected: a bag-of-characters L1 lower bound —
    *     `levenshtein ≥ L1(letter histograms)/2` — prunes 438k→198k
    *     candidates on the q71 corpus but is net SLOWER end-to-end,
    *     3.3 s vs 2.3 s steady at sf0.1: the 26-int histograms fatten
    *     every postings shuffle row and the per-join-row interpreted
    *     zip costs more than the short-string levenshteins it avoids.
    *     Worth revisiting only for long strings, where levenshtein's
    *     O(len²) dominates.)
    *   - minimum shared tokens: a pair is a candidate only if it shares
    *     ≥ `minSharedTokens` surviving tokens (counted in the same
    *     aggregation that dedups pairs, so it costs nothing extra).
    *     Completeness arithmetic: an edit script of k operations between
    *     two T-token strings damages at most ⌊3k/2⌋ tokens (a char edit
    *     damages 1; space moves come in balanced pairs damaging 3 per 2
    *     edits, since both sides have equal space counts), so any true
    *     pair shares ≥ T − ⌊3k/2⌋ tokens. For 5-token names at k ≤ 2
    *     that is ≥ 2 — requiring 2 is lossless there. Default 1 = no
    *     assumption about token counts. */
  def candidates(left: DataFrame, right: DataFrame,
                 leftId: String, leftCol: String, rightId: String, rightCol: String,
                 maxDist: Int, maxDf: Long = 1000L, maxDfRatio: Double = 0.001,
                 minSharedTokens: Int = 1): DataFrame = {
    val lt = left.select(col(leftId), col(leftCol),
      explode(array_distinct(TextAnalysis.tokens(lower(col(leftCol))))).as("_tok"))
    val rt = right.select(col(rightId), col(rightCol),
      explode(array_distinct(TextAnalysis.tokens(lower(col(rightCol))))).as("_tok"))
    // corpus size as a broadcast 1-row frame: the lit-projection scans read
    // zero columns (row-group metadata only), keeping the cap in-plan with
    // no driver-side count() action
    val total = left.select(lit(1).as("_one"))
      .unionAll(right.select(lit(1).as("_one")))
      .agg(count(lit(1)).as("_total"))
    val hot = lt.select(col("_tok")).unionAll(rt.select(col("_tok")))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
      .crossJoin(broadcast(total))
      .where(col("_df") > greatest(lit(maxDf),
        (col("_total") * maxDfRatio).cast("long")))
      .select(col("_tok"))
    lt.join(hot, Seq("_tok"), "left_anti")
      .join(rt.join(hot, Seq("_tok"), "left_anti"), Seq("_tok"))
      .where(abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      .groupBy(col(leftId), col(leftCol), col(rightId), col(rightCol))
      .agg(count(lit(1)).as("_shared"))
      .where(col("_shared") >= minSharedTokens)
      .select(col(leftId), col(leftCol), col(rightId), col(rightCol))
  }

  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftCol: String, rightId: String, rightCol: String,
           maxDist: Int, maxDf: Long = 1000L, maxDfRatio: Double = 0.001,
           minSharedTokens: Int = 1): DataFrame =
    candidates(left, right, leftId, leftCol, rightId, rightCol,
        maxDist, maxDf, maxDfRatio, minSharedTokens)
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .where(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist").cast("long").as("dist"))

  /** Character q-gram candidates — the variant for SINGLE-token names.
    * Count argument: one edit destroys at most q q-grams, so strings
    * within distance k share at least max(len) - q + 1 - k*q q-grams;
    * requiring >= 1 shared q-gram is therefore complete whenever the
    * LONGER string exceeds (k+1)*q - 1 characters. Strings at or under
    * that length additionally join a shared short-string bucket: a
    * short-short pair may share no q-gram within the budget (they meet in
    * the bucket instead), while a short-long pair still meets through the
    * longer side's guaranteed overlap — short strings emit their real
    * grams too. The bucket verifies exhaustively but only over the rare
    * very-short names, so it stays bounded. */
  def joinQgram(left: DataFrame, right: DataFrame,
                leftId: String, leftCol: String, rightId: String, rightCol: String,
                maxDist: Int, q: Int = 3, maxDf: Long = 10000L): DataFrame = {
    val minLen = (maxDist + 1) * q
    def gramsOf(c: Column) =
      array_distinct(transform(
        sequence(lit(1), greatest(length(c) - (q - 1), lit(1))),
        i => c.substr(i, lit(q))))
    def keyed(c: Column) =
      when(length(c) <= minLen,
        concat(array(lit(" SHORT")), gramsOf(lower(c))))
        .otherwise(gramsOf(lower(c)))
    val lt = left.select(col(leftId), col(leftCol),
      explode(keyed(col(leftCol))).as("_g"))
    val rt = right.select(col(rightId), col(rightCol),
      explode(keyed(col(rightCol))).as("_g"))
    val hot = lt.select(col("_g")).unionAll(rt.select(col("_g")))
      .groupBy(col("_g")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf && col("_g") =!= " SHORT").select(col("_g"))
    val cand = lt.join(hot, Seq("_g"), "left_anti")
      .join(rt.join(hot, Seq("_g"), "left_anti"), Seq("_g"))
      .select(col(leftId), col(leftCol), col(rightId), col(rightCol))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .where(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist").cast("long").as("dist"))
  }
}
