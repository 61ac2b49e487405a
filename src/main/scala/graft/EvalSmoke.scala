package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted scale smoke for the round-13 eval/curation audits
  * (readability, distinct-n, ROC-AUC, majority vote, length bias) at
  * sizes beyond [[ScaleSmoke]]'s full-main envelope — the full main
  * synthesizes 1M binary image assets at n=1M, which exceeds the
  * driver result budget long before these scan-side ops are reached.
  * Fixtures are xxhash64-derived (the winnow-fixture rule). Writes
  * nothing outside /tmp. */
object EvalSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    type C = org.apache.spark.sql.Column
    def toks(id: C, cnt: Int): C =
      transform(sequence(lit(1), lit(cnt)), j =>
        concat(lit("t"), pmod(xxhash64(id * 120 + j, lit(7741)),
          lit(100000000019L))))
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", toks(col("id"), 60)).as("text"))
      .repartition(32).persist()
    println(s"corpus: ${docs.count()} docs")

    var t0 = System.nanoTime()
    val fre = ops.Quality.readability(docs)
    val freN = fre.groupBy(col("fre_band")).count().collect()
      .map(_.getLong(1)).sum
    println(f"readability($n docs): ${(System.nanoTime()-t0)/1e9}%.1f s")
    assert(freN == n, "one verdict per doc")

    t0 = System.nanoTime()
    val dn = ops.Chat.distinctNgrams(docs.select(
      expr("doc_id div 4").as("prompt_id"), col("doc_id").as("cand_id"),
      col("text")))
    val dnBad = dn.where(col("d1_ppm") < 990000L).count()
    println(f"distinctNgrams($n cands, ${n / 4} prompts): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, $dnBad prompts below 0.99")

    t0 = System.nanoTime()
    val auc = ops.QualityModel.rocAuc(spark.range(n).select(
      pmod(xxhash64(col("id"), lit(4099)), lit(1000001L)).as("score_ppm"),
      (pmod(xxhash64(col("id"), lit(4099)), lit(1000001L)) > 500000L)
        .as("label"))).head()
    println(f"rocAuc($n rows): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"auc_ppm=${auc.getLong(5)}")
    assert(auc.getLong(5) == 1000000L,
      "threshold-consistent labels must read AUC exactly 1")

    t0 = System.nanoTime()
    val mv = ops.Chat.majorityVote(spark.range(n).select(
      expr("id div 8").as("problem_id"),
      when(pmod(xxhash64(col("id"), lit(7717)), lit(2)) === 0,
        concat(lit("a"), pmod(expr("id div 8"), lit(4)).cast("string")))
        .otherwise(concat(lit("a"), pmod(xxhash64(col("id"), lit(7717)),
          lit(5)).cast("string"))).as("answer"),
      concat(lit("a"), pmod(expr("id div 8"), lit(4)).cast("string"))
        .as("gold")))
    val mvAcc = mv.head().getLong(7)
    println(f"majorityVote($n samples, ${n / 8} problems): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, acc_ppm=$mvAcc")
    assert(mvAcc > 900000L, "gold majority must dominate")

    t0 = System.nanoTime()
    val lb = ops.Chat.lengthBias(spark.range(n).select(
      col("id").as("pair_id"),
      (lit(1000L) + pmod(xxhash64(col("id"), lit(31)), lit(512L)))
        .as("chosen_chars"),
      (lit(1000L) + pmod(xxhash64(col("id"), lit(37)), lit(512L)))
        .as("rejected_chars"), lit(true).as("ok"))).collect()
    println(f"lengthBias($n pairs): ${(System.nanoTime()-t0)/1e9}%.1f s, " +
      f"${lb.length} bands, global=${lb.head.getLong(5)}")
    assert(lb.length <= 11, "bands bounded by the delta bit width")

    t0 = System.nanoTime()
    val ga = ops.Stats.rankAgreement(spark.range(n).select(
      pmod(xxhash64(col("id"), lit(53)), lit(16L)).as("x"),
      pmod(xxhash64(col("id"), lit(53)), lit(16L)).as("y"))).head()
    println(f"rankAgreement($n rows, monotone): " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s, gamma_ppm=${ga.getLong(3)}")
    assert(ga.getLong(3) == 1000000L, "identical scores read gamma 1e6")
    spark.stop()
  }
}
