package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B measurement for the k-means trainers' `persistCorpus` flag (the
  * r13 watch item): same synthetic 64-dim corpus, both trainers, flag
  * off vs on, best of `reps`. The flag caches the milli-quantized
  * projection across the training scans (k−1 seed argmaxes + `rounds`
  * Lloyd passes) and releases it before the lazy assignment returns —
  * the question is whether re-deriving a transform-of-a-cached-source
  * is actually slower than storing it. Results + the guidance rule live
  * in BENCH_NOTES.md ("persistCorpus A/B").
  *
  *   sbt "runMain graft.PersistSmoke 100000 3"
  */
object PersistSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    // the ScaleSmoke pvecs fixture: deterministic 64-dim floats in
    // [-1, 1]; the SOURCE is persisted, so the A/B isolates the
    // quantized projection's recompute cost, not parquet/disk reads
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), j =>
        ((pmod(col("id") * 31 + j * 7, lit(2001)) - 1000) / 1000.0)
          .cast("float")).as("embedding"))
      .repartition(32).persist()
    vecs.count()
    def best(run: () => Long): (Double, Long) = {
      var out = -1L
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        out = run()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, out)
    }
    for ((trainer, fn) <- Seq[(String, Boolean => Long)](
      "lloyd" -> (p => ops.Similarity
        .kmeansClusters(vecs, k = 16, rounds = 4, persistCorpus = p)
        .count()),
      "kcenter" -> (p => ops.Similarity
        .kmeansClustersKcenter(vecs, k = 16, rounds = 4, persistCorpus = p)
        .count()));
         flag <- Seq(false, true)) {
      val (secs, rows) = best(() => fn(flag))
      println(f"$trainer%-8s persistCorpus=$flag%-5s n=$n: $secs%6.1f s ($rows rows)")
    }
    spark.stop()
  }
}
