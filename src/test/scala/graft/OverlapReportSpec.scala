package graft

import graft.ops.Curate

/** Per-benchmark contamination report: overlap fractions, longest
  * verbatim run, case sensitivity, and the sub-n floor on planted
  * fixtures.
  */
class OverlapReportSpec extends SparkTestBase {
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
                  n: Int = 3): Map[Long, (Long, Long, Double, Long, Boolean)] =
    Curate.overlapReport(corpus.toDF("doc_id", "text"),
      bench.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("fully leaked, partially leaked, and clean benchmark docs") {
    val corpus = Seq(
      1L -> "a b c d e f g h",
      2L -> "filler one two three")
    val bench = Seq(
      // identical to corpus doc -> every gram hits, run spans all positions
      10L -> "a b c d e f g h",
      // prefix leaked (a b c d), suffix novel: grams "a b c","b c d" hit;
      // "c d x1" onward miss
      11L -> "a b c d x1 x2 x3 x4",
      // clean
      12L -> "n1 n2 n3 n4 n5")
    val got = run(corpus, bench)
    assert(got(10L) == ((6L, 6L, 1.0, 6L, true)))
    assert(got(11L) == ((6L, 2L, 2 / 6.0, 2L, true)))
    assert(got(12L) == ((3L, 0L, 0.0, 0L, false)))
  }

  test("two separated leaked spans report the longest, not the sum") {
    val corpus = Seq(1L -> "p q r", 2L -> "s t u v")
    val bench = Seq(
      // hits at positions 1 ("p q r") and 5,6 ("s t u","t u v") — runs 1 and 2
      20L -> "p q r zz yy s t u v")
    val got = run(corpus, bench)
    assert(got(20L)._2 == 3L) // n_hit
    assert(got(20L)._4 == 2L) // longest_run
  }

  test("matching is case-sensitive (verbatim-leak semantics)") {
    val got = run(Seq(1L -> "A B C D"), Seq(30L -> "a b c d"))
    assert(got(30L)._2 == 0L)
  }

  test("benchmark docs under n tokens report zero evidence") {
    val got = run(Seq(1L -> "w x y z"), Seq(40L -> "w x", 41L -> ""))
    assert(got(40L) == ((0L, 0L, 0.0, 0L, false)))
    assert(got(41L) == ((0L, 0L, 0.0, 0L, false)))
  }

  test("threshold flag matches the decontaminate rule shape") {
    // 1 hit of 6 grams = 16.7% < 20% default -> not contaminated
    val corpus = Seq(1L -> "k1 k2 k3")
    val bench = Seq(50L -> "k1 k2 k3 z1 z2 z3 z4 z5")
    val got = run(corpus, bench)
    assert(got(50L)._2 == 1L && !got(50L)._5)
  }
}
