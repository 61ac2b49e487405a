package graft.ops

import org.apache.spark.sql.DataFrame
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
  * an equi-keyed shuffle. The completeness caveat (a pair could in theory
  * mutate every single token within the budget) is the standard q-gram
  * filter trade-off — tighten with character q-grams instead of word
  * tokens when names are single-token. */
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
}
