package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for knnGraph stage costs (not a test).
  * args: [n] [mode] — mode `all` (default) runs the knnGraph profile,
  * the persisted-index LSM leg and the recall grid; `lsm` runs ONLY
  * the LSM leg (build/append/search/compact timings — the growth-curve
  * datapoints at ns where the full grid would dominate the run). */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val mode = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    def gvec(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(32)), j =>
        ((pmod(xxhash64(id * 32 + j, lit(5581)), lit(2001)) - 1000) / 1000.0)
          .cast("float"))
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      gvec(col("id")).as("embedding")).persist()
    corpus.count()
    val planes = math.max(6, (math.log(n.toDouble) / math.log(2)).ceil.toInt - 4)
    for (r <- (if (mode == "lsm") Seq.empty[Int] else Seq(0, 0, 1))) {
      val t0 = System.nanoTime()
      val e = ops.GraphAnn.knnGraph(corpus, degree = 4, planes = planes,
        maxBucket = 1024, refineRounds = r).count()
      println(f"knnGraph(n=$n, refine=$r): ${(System.nanoTime()-t0)/1e9}%.1f s, $e edges")
    }
    // persisted-index LSM leg at the same n (round 16: the 256-way
    // bucket-group layout must stay flat as n grows — directory count
    // is the thing being probed, so timings here ARE the evidence)
    var t0 = System.nanoTime()
    val path = java.nio.file.Files
      .createTempDirectory("graft-gann-probe").toString
    ops.GraphAnn.buildGraphIndex(corpus, path, degree = 4, planes = planes,
      maxBucket = 1024, refineRounds = 0)
    println(f"buildGraphIndex(n=$n): ${(System.nanoTime()-t0)/1e9}%.1f s")
    val batch = spark.range(16).select((col("id") + n).as("vec_id"),
      gvec(col("id") * 101 + 7).as("embedding"))
    t0 = System.nanoTime()
    ops.GraphAnn.appendToGraphIndex(spark, path, batch)
    println(f"appendToGraphIndex(16 vecs): ${(System.nanoTime()-t0)/1e9}%.1f s")
    val probes = spark.range(8).select((col("id") + 2L * n).as("vec_id"),
      transform(gvec(col("id") * 4096), x => x * lit(2.0f)).as("embedding"))
    t0 = System.nanoTime()
    val hits = ops.GraphAnn.searchGraphIndex(spark, path, probes,
      k = 3, beam = 16, hops = 2).count()
    println(f"searchGraphIndex(8 probes): ${(System.nanoTime()-t0)/1e9}%.1f s, $hits rows")
    t0 = System.nanoTime()
    ops.GraphAnn.compactGraphIndex(spark, path)
    println(f"compactGraphIndex: ${(System.nanoTime()-t0)/1e9}%.1f s")
    if (mode == "lsm") { spark.stop(); return }
    // recall grid on CLUSTERED vectors (r16 verdict: certificates prove
    // traversal correctness, not recall on natural data). Points
    // scatter around n/1000 deterministic centers; ground truth is
    // brute-force top-10 for 32 held-out probes.
    def cvec(id: org.apache.spark.sql.Column, nClusters: Int) =
      org.apache.spark.sql.functions.zip_with(
        transform(sequence(lit(1), lit(32)), j =>
          ((pmod(xxhash64(pmod(id, lit(nClusters)) * 32 + j, lit(977)),
            lit(2001)) - 1000) / 1000.0).cast("float")),
        transform(sequence(lit(1), lit(32)), j =>
          ((pmod(xxhash64(id * 32 + j, lit(5581)), lit(2001)) - 1000)
            / 1000.0 * 0.3).cast("float")),
        (a, b) => a + b)
    val nc = math.max(16, n / 1000)
    val cCorpus = spark.range(n).select(col("id").as("vec_id"),
      cvec(col("id"), nc).as("embedding")).persist()
    cCorpus.count()
    val cProbes = spark.range(32).select((col("id") + 2L * n).as("vec_id"),
      cvec(col("id") + 2L * n, nc).as("embedding"))
    val truth = ops.Similarity.bruteForceKnn(cProbes, cCorpus, k = 10)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cEdges = ops.GraphAnn.knnGraph(cCorpus, degree = 8, planes = planes,
      maxBucket = 1024, refineRounds = 1).persist()
    cEdges.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(truth).size.toDouble / truth.size
    for (beam <- Seq(16, 32, 64); hops <- Seq(1, 2, 3)) {
      val t = System.nanoTime()
      val r = recallOf(ops.GraphAnn.beamSearch(cProbes, cCorpus, cEdges,
        k = 10, beam = beam, hops = hops, planes = planes))
      println(f"recall@10(n=$n, clusters=$nc, beam=$beam, hops=$hops): " +
        f"$r%.3f (${(System.nanoTime()-t)/1e9}%.1f s)")
    }
    val cPath = java.nio.file.Files
      .createTempDirectory("graft-gann-recall").toString
    ops.GraphAnn.buildGraphIndex(cCorpus, cPath, degree = 8, planes = planes,
      maxBucket = 1024, refineRounds = 1)
    t0 = System.nanoTime()
    val ri = recallOf(ops.GraphAnn.searchGraphIndex(spark, cPath, cProbes,
      k = 10, beam = 32, hops = 2))
    println(f"recall@10 persisted(n=$n, beam=32, hops=2): $ri%.3f " +
      f"(${(System.nanoTime()-t0)/1e9}%.1f s)")
    spark.stop()
  }
}
