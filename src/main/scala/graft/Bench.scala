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
    // Steady-state mode: SPARK_GRAFT_BENCH_REPS=N runs each query N times
    // and reports the fastest rep — one-shot Janino codegen (~0.5-2 s per
    // fresh plan) otherwise dominates every sub-second query in a cold JVM.
    // Default 1 = the driver's cold-ish contract, unchanged.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt.max(1)
    // SPARK_GRAFT_BENCH_ONLY=q45_x,q46_y restricts to named queries (dev loop)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names.contains(n) })
    // noop sink: evaluates EVERY output column distributedly (count() would
    // let Catalyst prune unreferenced projections and under-measure).
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        val t = (System.nanoTime() - t0) / 1e9
        // operators that persist intermediates (minhash signatures, shingle
        // postings) must not donate cached blocks to later queries or later
        // reps — each execution pays for, and is measured with, its own
        // caching
        spark.catalog.clearCache()
        t
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Host-load context: a contended host inflates wall-clock by 10x+
    // (round-3's driver capture showed q01 at 79s vs 2.6s quiet), so the
    // artifact records the 1-minute load average alongside the numbers.
    val load = try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"cpus":$cpus,"load_avg_1m":$load}"""
    println(line)
    // The driver captures stdout with a bounded tail; round-3's official
    // total was lost to truncation of this single long line. Persist the
    // same JSON to a file so the number survives independent of console
    // capture. SPARK_GRAFT_BENCH_OUT overrides the default path.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
  }
}
