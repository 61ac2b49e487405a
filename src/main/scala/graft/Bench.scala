package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fastest successful rep, or Left(first error). A query that throws
    * must NOT surface as a (fast) timing — round-6 advice: a broken query
    * looked like a sub-second success in the artifact. `afterRep` runs
    * after every rep, success or failure (cache hygiene). */
  def measure(reps: Int, run: () => Unit,
              afterRep: () => Unit = () => ()): Either[String, Double] = {
    var err: Option[String] = None
    val times = (1 to reps).flatMap { _ =>
      val t0 = System.nanoTime()
      val ok =
        try { run(); true }
        catch { case e: Throwable =>
          if (err.isEmpty) err = Some(e.toString.take(200)); false
        }
      val t = (System.nanoTime() - t0) / 1e9
      afterRep()
      if (ok) Some(t) else None
    }
    if (times.nonEmpty) Right(times.min) else Left(err.getOrElse("failed"))
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The one-line artifact. Failed queries are EXCLUDED from `queries`
    * and `value` (their wall-clock is meaningless) and listed under
    * `errors` with their message — a hole reads as a hole, not a fast
    * number. */
  def renderJson(ok: Seq[(String, Double)], errors: Seq[(String, String)],
                 sfDir: String, reps: Int, cpus: String, load: Double): String = {
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_err":${errors.size},"sf":"$sfDir","reps":$reps,"cpus":$cpus,"load_avg_1m":$load}"""
  }

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
    val results = selected.toSeq.map { case (name, fn) =>
      val r = measure(reps,
        run = () => fn(spark, sfDir).write.mode("overwrite").format("noop").save(),
        // operators that persist intermediates (minhash signatures, shingle
        // postings) must not donate cached blocks to later queries or later
        // reps — each execution pays for, and is measured with, its own
        // caching
        afterRep = () => spark.catalog.clearCache())
      r.left.foreach(m => System.err.println(s"[bench] $name failed: $m"))
      name -> r
    }
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errors = results.collect { case (k, Left(m)) => k -> m }
    // Host-load context: a contended host inflates wall-clock by 10x+
    // (round-3's driver capture showed q01 at 79s vs 2.6s quiet), so the
    // artifact records the 1-minute load average alongside the numbers.
    val load = try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }
    val line = renderJson(ok, errors, sfDir, reps, cpus, load)
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
