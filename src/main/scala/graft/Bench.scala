package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timers: JVM/codegen/parquet-reader init otherwise
    // lands entirely on whichever query happens to run first.
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // noop sink: evaluates EVERY output column distributedly (count() would
    // let Catalyst prune unreferenced projections and under-measure).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val t = (System.nanoTime() - t0) / 1e9
      // operators that persist intermediates (minhash signatures, shingle
      // postings) must not donate cached blocks to later queries — each
      // query pays for, and is measured with, its own caching
      spark.catalog.clearCache()
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
