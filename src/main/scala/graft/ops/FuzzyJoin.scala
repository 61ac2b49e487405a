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

  def join(left: DataFrame, right: DataFrame,
           leftId: String, leftCol: String, rightId: String, rightCol: String,
           maxDist: Int, maxDf: Long = 1000L): DataFrame = {
    val lt = left.select(col(leftId), col(leftCol),
      explode(array_distinct(TextAnalysis.tokens(lower(col(leftCol))))).as("_tok"))
    val rt = right.select(col(rightId), col(rightCol),
      explode(array_distinct(TextAnalysis.tokens(lower(col(rightCol))))).as("_tok"))
    // df cap on the concatenated posting lists (skew guard, see Scaladoc)
    val hot = lt.select(col("_tok")).unionAll(rt.select(col("_tok")))
      .groupBy(col("_tok")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select(col("_tok"))
    val cand = lt.join(hot, Seq("_tok"), "left_anti")
      .join(rt.join(hot, Seq("_tok"), "left_anti"), Seq("_tok"))
      .select(col(leftId), col(leftCol), col(rightId), col(rightCol))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .where(col("dist") <= maxDist)
      .select(col(leftId), col(rightId), col("dist").cast("long").as("dist"))
  }

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
