package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's error contract (round-6 advice): a query
  * that throws must land under `errors`, not as a fast timing. Pure
  * logic — no SparkSession needed. */
class BenchSpec extends AnyFunSuite {

  test("measure: fastest successful rep wins; afterRep always runs") {
    var calls = 0
    var hygiene = 0
    val r = Bench.measure(3, run = () => { calls += 1 }, afterRep = () => hygiene += 1)
    assert(r.isRight && r.toOption.get >= 0.0)
    assert(calls == 3 && hygiene == 3)
  }

  test("measure: a throwing query yields Left with the first error, no timing") {
    var hygiene = 0
    val r = Bench.measure(2,
      run = () => throw new IllegalStateException("boom"),
      afterRep = () => hygiene += 1)
    assert(r == Left("java.lang.IllegalStateException: boom"))
    assert(hygiene == 2, "cache hygiene must run even for failed reps")
  }

  test("measure: partial failures keep the successful rep") {
    var n = 0
    val r = Bench.measure(3, run = () => { n += 1; if (n != 2) throw new RuntimeException("flaky") })
    assert(r.isRight, "one successful rep is a timing, not an error")
  }

  test("measureGated: over-threshold rep spends a retry; attempts and max load recorded") {
    // loads: first attempt contended (4.0), retry quiet (1.0)
    val loads = Iterator(4.0, 4.0, 1.0, 1.0)
    var runs = 0
    val g = Bench.measureGated(reps = 1, run = () => runs += 1,
      maxLoad = 2.5, maxRetries = 1, loadFn = () => loads.next())
    assert(runs == 2, "contended rep must be retried")
    assert(g.attempts == 2 && g.maxLoadSeen == 4.0)
    assert(g.timing.isRight)
  }

  test("measureGated: retries exhausted keeps the suspect timing (labeled, not a hole)") {
    val g = Bench.measureGated(reps = 1, run = () => (),
      maxLoad = 0.5, maxRetries = 2, loadFn = () => 9.9)
    assert(g.attempts == 3, "reps + maxRetries attempts under sustained load")
    assert(g.timing.isRight, "a suspect timing beats a hole; max_rep_load labels it")
    assert(g.maxLoadSeen == 9.9)
  }

  test("measureGated: gate judges EXTERNAL load — own-JVM contribution is subtracted") {
    // raw loadavg 4.0 on every sample; the JVM itself accounts for 3.6
    // of it -> external 0.4 is under the 2.5 gate, the rep certifies
    // without burning a retry (the r13 self-rejection failure mode)
    var runs = 0
    val g = Bench.measureGated(reps = 2, run = () => runs += 1,
      maxLoad = 2.5, maxRetries = 3,
      loadFn = () => 4.0, ownLoadFn = () => 3.6)
    assert(runs == 2 && g.attempts == 2, "self-load must not trip the gate")
    assert(g.maxLoadSeen == 4.0 && math.abs(g.maxExtSeen - 0.4) < 1e-9)
    // same raw load but a mostly-idle JVM: the 3.5 external cores are
    // co-tenant noise and every attempt is suspect
    val h = Bench.measureGated(reps = 1, run = () => (),
      maxLoad = 2.5, maxRetries = 2,
      loadFn = () => 4.0, ownLoadFn = () => 0.5)
    assert(h.attempts == 3 && h.timing.isRight)
    assert(math.abs(h.maxExtSeen - 3.5) < 1e-9)
  }

  test("OwnLoad: tracks busy-spin up and decays toward idle") {
    val before = Bench.OwnLoad.sample()
    val stop = System.nanoTime() + 400L * 1000 * 1000
    var x = 0L
    while (System.nanoTime() < stop) { x += 1 } // ~0.4 s of one busy core
    val after = Bench.OwnLoad.sample()
    assert(after > before, s"busy spin must raise own load ($before -> $after, spun $x)")
    assert(after < 33.0, "own load is bounded by the core count")
  }

  test("measureGated: quiet host is exactly the old measure — reps attempts, no retries") {
    var runs = 0
    val g = Bench.measureGated(reps = 3, run = () => runs += 1,
      maxLoad = 2.5, maxRetries = 5, loadFn = () => 1.0)
    assert(runs == 3 && g.attempts == 3)
  }

  test("renderCompact: one short parseable object with value/n_err") {
    val line = Bench.renderCompact(ok = Seq("q1" -> 1.5, "q2" -> 0.5), nErr = 1,
      sfDir = "/sf", reps = 3, cpus = "32", load = 1.2, loadRetries = 2,
      maxRepLoad = 2.9, outPath = "BENCH_SELF.json")
    assert(line.contains(""""value":2.0""") && line.contains(""""n_err":1"""))
    assert(line.contains(""""n_queries":2""") && line.contains(""""load_retries":2"""))
    assert(!line.contains(""""queries""""), "compact line must omit the per-query map")
    assert(!line.contains("\n") && ujsonFree(line))
  }

  test("renderJson: failed queries excluded from queries/total, listed in errors") {
    val line = Bench.renderJson(
      ok = Seq("q1" -> 1.5, "q2" -> 0.5),
      errors = Seq("q3" -> "java.lang.RuntimeException: \"quoted\"\nnewline"),
      sfDir = "/sf", reps = 1, cpus = "4", load = 0.1)
    assert(line.contains(""""value":2.0"""))
    assert(line.contains(""""q1":1.5""") && line.contains(""""q2":0.5"""))
    assert(!line.contains(""""q3":0""") && !line.contains(""""q3":1"""))
    assert(line.contains(""""n_err":1"""))
    // the artifact must stay one parseable JSON line despite quotes/newlines
    assert(!line.contains("\n"))
    val parsed = ujsonFree(line)
    assert(parsed, "artifact line must be valid JSON")
  }

  // minimal JSON validity probe without a JSON library: Spark's own
  // parser via the SQL expression would need a session; use jackson,
  // which is on Spark's classpath
  private def ujsonFree(s: String): Boolean =
    try {
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(s) != null
    } catch { case _: Throwable => false }
}
