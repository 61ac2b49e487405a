package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** One query's gated measurement: the timing verdict, how many run
    * attempts were spent (> the trusted-rep quota when the load gate
    * forced retries), the highest 1-minute load average sampled around
    * any attempt, and the highest EXTERNAL load (load minus this JVM's
    * own tracked CPU — the quantity the gate actually judges). */
  case class Gated(timing: Either[String, Double], attempts: Int,
                   maxLoadSeen: Double, maxExtSeen: Double = -1.0)

  def systemLoad(): Double =
    try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** This JVM's own contribution to the 1-minute load average: process
    * CPU usage (cores busy) folded through the SAME exponential decay
    * Linux loadavg uses (e^(-dt/60)), so `systemLoad() - ownLoad()` is
    * an apples-to-apples estimate of CO-TENANT load. The r13 lesson:
    * gating on raw loadavg self-rejects — a healthy local[32] bench
    * drives the host average past any sane threshold all by itself, so
    * every rep burned its retry against the bench's own reflection and
    * the artifact could never certify a quiet host. */
  object OwnLoad {
    private val os = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
    private def cpuNs: Long = os match {
      case s: com.sun.management.OperatingSystemMXBean => s.getProcessCpuTime
      case _ => -1L
    }
    private var lastCpu = cpuNs
    private var lastT = System.nanoTime()
    private var ewma = 0.0
    private var daemonOn = false
    /** Background sampler (r14 advice): sample() only advances when
      * called, so a long gap collapses the kernel's 5 s loadavg cadence
      * into one coarse decay step and the first gate after JVM start
      * reads a nearly-cold tracker. A daemon ticking every `periodMs`
      * keeps the EWMA advancing at the same cadence loadavg itself
      * does. Note the tracker DELIBERATELY starts at 0: the JVM's
      * contribution to loadavg also starts at 0 and ramps through the
      * same e^(-dt/60) — seeding with instantaneous CPU would
      * overestimate own-load early and under-gate real co-tenant noise. */
    def startDaemon(periodMs: Long = 5000): Unit = synchronized {
      if (!daemonOn) {
        daemonOn = true
        val t = new Thread(() => {
          while (true) { Thread.sleep(periodMs); sample() }
        }, "ownload-sampler")
        t.setDaemon(true)
        t.start()
      }
    }
    /** Advance the tracker and return the current own-load estimate. */
    def sample(): Double = synchronized {
      val now = System.nanoTime()
      val cpu = cpuNs
      val dt = (now - lastT) / 1e9
      if (cpu >= 0 && lastCpu >= 0 && dt > 0.05) {
        val cores = (cpu - lastCpu) / 1e9 / dt
        val a = math.exp(-dt / 60.0)
        ewma = ewma * a + cores * (1 - a)
        lastCpu = cpu; lastT = now
      }
      ewma
    }
  }

  /** Fastest successful rep, or Left(first error). A query that throws
    * must NOT surface as a (fast) timing — round-6 advice: a broken query
    * looked like a sub-second success in the artifact. `afterRep` runs
    * after every rep, success or failure (cache hygiene). */
  def measure(reps: Int, run: () => Unit,
              afterRep: () => Unit = () => ()): Either[String, Double] =
    measureGated(reps, run, afterRep).timing

  /** [[measure]] + a host-load gate (round-8 verdict: contended-host
    * variance leaked into round-closing artifacts; artifacts should be
    * self-certifying). A successful rep whose surrounding EXTERNAL load
    * — 1-minute load average minus `ownLoadFn`'s own-JVM estimate, max
    * of before/after samples — exceeds `maxLoad` does not count toward
    * the trusted-rep quota; the loop spends one of `maxRetries` extra
    * attempts instead. The over-threshold timing is KEPT as a fallback
    * (min over all successful reps is still reported when retries run
    * out: a suspect number labeled with its load beats a hole), and
    * `attempts`/`maxLoadSeen`/`maxExtSeen` land in the artifact so a
    * reader can tell a certified run from a contended one. With the
    * default `ownLoadFn` (0) the gate judges raw loadavg; with the
    * default gate disabled (MaxValue) this is exactly the old
    * [[measure]]: `reps` attempts, fastest success wins. */
  def measureGated(reps: Int, run: () => Unit,
                   afterRep: () => Unit = () => (),
                   maxLoad: Double = Double.MaxValue, maxRetries: Int = 0,
                   loadFn: () => Double = () => systemLoad(),
                   ownLoadFn: () => Double = () => 0.0): Gated = {
    var err: Option[String] = None
    var times = List.empty[Double]
    var trusted = 0
    var attempts = 0
    var maxSeen = -1.0
    var maxExt = -1.0
    while (trusted < reps && attempts < reps + maxRetries) {
      val l0 = loadFn(); val o0 = ownLoadFn()
      val t0 = System.nanoTime()
      val ok =
        try { run(); true }
        catch { case e: Throwable =>
          if (err.isEmpty) err = Some(e.toString.take(200)); false
        }
      val t = (System.nanoTime() - t0) / 1e9
      val l1 = loadFn(); val o1 = ownLoadFn()
      val repLoad = math.max(l0, l1)
      // gate on the EXTERNAL component: loadavg minus this JVM's own
      // tracked contribution at the same sample instant (max of the
      // before/after estimates — a co-tenant spiking on either side of
      // the rep taints it)
      val repExt = math.max(l0 - o0, l1 - o1)
      if (repLoad > maxSeen) maxSeen = repLoad
      if (repExt > maxExt) maxExt = repExt
      afterRep()
      attempts += 1
      if (ok) {
        times ::= t
        if (repExt <= maxLoad) trusted += 1
      }
    }
    Gated(
      if (times.nonEmpty) Right(times.min) else Left(err.getOrElse("failed")),
      attempts, maxSeen, maxExt)
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
                 sfDir: String, reps: Int, cpus: String, load: Double,
                 loadRetries: Int = 0, maxRepLoad: Double = -1.0,
                 loadGate: Double = -1.0, maxRepExt: Double = -1.0,
                 ownLoad: Double = -1.0): String = {
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_err":${errors.size},"sf":"$sfDir","reps":$reps,"cpus":$cpus,"load_avg_1m":$load,"load_retries":$loadRetries,"max_rep_load":$maxRepLoad,"load_gate":$loadGate,"max_rep_ext_load":$maxRepExt,"own_load_1m":$ownLoad}"""
  }

  /** Short summary WITHOUT the per-query map — small enough to survive
    * the driver's bounded-tail stdout capture intact (BENCH_r6..r8 all
    * recorded `parsed: null` because the full line's head, where
    * `"value"` lives, was truncated away). Printed LAST so the tail of
    * stdout always ends with one complete, parseable JSON object; the
    * full artifact precedes it on stdout and is persisted to `outPath`. */
  def renderCompact(ok: Seq[(String, Double)], nErr: Int, sfDir: String,
                    reps: Int, cpus: String, load: Double, loadRetries: Int,
                    maxRepLoad: Double, outPath: String): String = {
    val total = ok.map(_._2).sum
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ok.size},"n_err":$nErr,"sf":"$sfDir","reps":$reps,"cpus":$cpus,"load_avg_1m":$load,"load_retries":$loadRetries,"max_rep_load":$maxRepLoad,"full_artifact":${jstr(outPath)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Start the own-load tracker FIRST: warmup + session init take long
    // enough that the EWMA is meaningfully converged before the first
    // gated rep (the r14-advice cold-start fix).
    OwnLoad.startDaemon()
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
    // Default 3 (r13 verdict): the official artifact should be a
    // steady-state number, not a single-shot upper bound; the env var
    // still overrides for a deliberately-cold run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Host-load gate on the EXTERNAL load (loadavg minus this JVM's own
    // EWMA-tracked CPU — see OwnLoad): raw loadavg self-rejects, because
    // a healthy local[32] bench alone sustains 3-5. 2.5 external cores
    // rejects genuine co-tenant noise. One extra attempt per query
    // bounds the gate's cost at (reps+1)/reps.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "2.5").toDouble
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RETRIES", "1").toInt.max(0)
    // SPARK_GRAFT_BENCH_ONLY=q45_x,q46_y restricts to named queries (dev loop)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names.contains(n) })
    // noop sink: evaluates EVERY output column distributedly (count() would
    // let Catalyst prune unreferenced projections and under-measure).
    val results = selected.toSeq.map { case (name, fn) =>
      val g = measureGated(reps,
        run = () => fn(spark, sfDir).write.mode("overwrite").format("noop").save(),
        // operators that persist intermediates (minhash signatures, shingle
        // postings) must not donate cached blocks to later queries or later
        // reps — each execution pays for, and is measured with, its own
        // caching
        afterRep = () => spark.catalog.clearCache(),
        maxLoad = maxLoad, maxRetries = maxRetries,
        ownLoadFn = () => OwnLoad.sample())
      g.timing.left.foreach(m => System.err.println(s"[bench] $name failed: $m"))
      name -> g
    }
    val ok = results.collect {
      case (k, g) if g.timing.isRight => k -> g.timing.toOption.get }
    val errors = results.collect {
      case (k, g) if g.timing.isLeft => k -> g.timing.swap.toOption.get }
    val loadRetries = results.map { case (_, g) => (g.attempts - reps).max(0) }.sum
    val maxRepLoad = results.map(_._2.maxLoadSeen).foldLeft(-1.0)(math.max)
    val maxRepExt = results.map(_._2.maxExtSeen).foldLeft(-1.0)(math.max)
    // Host-load context: a contended host inflates wall-clock by 10x+
    // (round-3's driver capture showed q01 at 79s vs 2.6s quiet), so the
    // artifact records the 1-minute load average alongside the numbers.
    val load = systemLoad()
    val line = renderJson(ok, errors, sfDir, reps, cpus, load,
      loadRetries, maxRepLoad, maxLoad, maxRepExt, OwnLoad.sample())
    println(line)
    // The driver captures stdout with a bounded tail; round-3's official
    // total was lost to truncation of this single long line. Persist the
    // same JSON to a file so the number survives independent of console
    // capture. SPARK_GRAFT_BENCH_OUT overrides the default path.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    // Compact summary LAST: the driver's truncated-tail capture then
    // always ends with one complete JSON object carrying value/n_err.
    println(renderCompact(ok, errors.size, sfDir, reps, cpus, load,
      loadRetries, maxRepLoad, outPath))
    spark.stop()
  }
}
