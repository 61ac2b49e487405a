package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for knnGraph stage costs (not a test). */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
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
    for (r <- Seq(0, 0, 1)) {
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
    spark.stop()
  }
}
