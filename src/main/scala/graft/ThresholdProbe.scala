package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.model.Tables

/** Round-3 tuning probe for the self-certifying queries' thresholds:
  * measures (a) the max one-token-mutation SimHash hamming distance (q26),
  * (b) per-query ANN hit counts vs exact top-k (q28 LSH, q36 IVF), and
  * (c) whether every planted minhash near-dup twin is dropped (q25) —
  * at each scale factor, so the committed thresholds carry real margin. */
object ThresholdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)

    for (sf <- Seq("0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val docs = Tables.documents(spark, d)
      // q26: hamming between sig(text) and sig(text + one token)
      val ham = docs.select(
        bit_count(Dedup.simhash(col("text"))
          .bitwiseXOR(Dedup.simhash(concat(col("text"), lit(" graftmutationtoken"))))).as("h"))
        .agg(max(col("h")), avg(col("h"))).collect()(0)
      println(s"sf$sf q26: max_hamming=${ham.get(0)} avg=${ham.get(1)}")
      // q26 order invariance violations (must be 0)
      val oi = docs.select((Dedup.simhash(col("text")) =!=
        Dedup.simhash(array_join(reverse(TextAnalysis.tokens(col("text"))), " "))).as("bad"))
        .where(col("bad")).count()
      println(s"sf$sf q26: order_invariance_violations=$oi")

      // q25: planted twins not dropped (must be 0)
      val planted = docs.where(size(TextAnalysis.tokens(col("text"))) >= 30)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(col("text"), lit(" graftplantedneardup")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(planted)
      val survivors = Dedup.minhashSurvivors(corpus, tau = 0.7)
      val nPlanted = planted.count()
      val missed = planted.select(col("doc_id"))
        .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi").count()
      println(s"sf$sf q25: planted=$nPlanted survivors_among_planted=$missed (want 0)")
      spark.catalog.clearCache()

      // q28 LSH hits per query
      val emb = Tables.embeddings(spark, d)
      val q = emb.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceKnn(q, emb, k = 5)
      val lsh = Similarity.lshKnn(q, emb, k = 5, planes = 6)
      val lshHits = lsh.select(col("qid"), col("nid"))
        .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
        .orderBy(col("qid")).collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(",")
      println(s"sf$sf q28 lsh hits/5: $lshHits")

      // q36 IVF hits per query
      val centroids = Similarity.fitCentroids(emb, nlist = 8, maxIter = 5)
      val ivf = Similarity.ivfKnn(q, emb, centroids, k = 5, nprobe = 3)
      val ivfHits = ivf.select(col("qid"), col("nid"))
        .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
        .orderBy(col("qid")).collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(",")
      println(s"sf$sf q36 ivf hits/5: $ivfHits")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
