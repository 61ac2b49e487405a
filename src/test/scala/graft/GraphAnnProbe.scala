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
    spark.stop()
  }
}
