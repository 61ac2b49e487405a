package graft

import graft.ops.Dedup

/** Exact duplicated-span removal (Lee et al. 2021 ExactSubstr) on planted
  * fixtures: cross-doc spans, within-doc repeats, full-doc removal, the
  * sub-minLen floor, and whitespace normalization of the reassembly.
  */
class DedupSubstrSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minLen: Int): Map[Long, (Long, Long, String)] =
    Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"), minLen = minLen)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cross-doc duplicated span removed from every occurrence") {
    val got = run(Seq(
      1L -> "a1 a2 D1 D2 D3 D4 z1 z2",
      2L -> "D1 D2 D3 D4",
      3L -> "u1 u2 u3 u4"), minLen = 3)
    // doc 1: dup grams at p=3,4 -> one island [3,6] (D1..D4)
    assert(got(1L) == ((8L, 4L, "a1 a2 z1 z2")))
    // doc 2: entirely the duplicated span -> empty survivor
    assert(got(2L) == ((4L, 4L, "")))
    // doc 3: untouched
    assert(got(3L) == ((4L, 0L, "u1 u2 u3 u4")))
  }

  test("within-doc repetition: both occurrences removed, islands fuse") {
    val got = run(Seq(1L -> "x y z w x y z w", 2L -> "n o p q"), minLen = 3)
    // dup grams "x y z"(p=1,5), "y z w"(p=2,6); [1,4]+[5,8] fuse -> all gone
    assert(got(1L) == ((8L, 8L, "")))
    assert(got(2L) == ((4L, 0L, "n o p q")))
  }

  test("spans shorter than minLen survive, even exact whole-doc dups") {
    val got = run(Seq(1L -> "s1 s2", 2L -> "s1 s2"), minLen = 3)
    assert(got(1L) == ((2L, 0L, "s1 s2")))
    assert(got(2L) == ((2L, 0L, "s1 s2")))
  }

  test("matching is case-sensitive (exact, not near-dup, semantics)") {
    val got = run(Seq(
      1L -> "A B C D tail1",
      2L -> "a b c d tail2"), minLen = 3)
    assert(got(1L)._2 == 0L)
    assert(got(2L)._2 == 0L)
  }

  test("interior gap between two duplicated spans survives") {
    val got = run(Seq(
      1L -> "D1 D2 D3 keep me E1 E2 E3",
      2L -> "D1 D2 D3 x E1 E2 E3"), minLen = 3)
    // both docs lose the two 3-token spans, keep their interiors
    assert(got(1L) == ((8L, 6L, "keep me")))
    assert(got(2L) == ((7L, 6L, "x")))
  }

  test("reassembly normalizes interior whitespace to single spaces") {
    val got = run(Seq(
      1L -> "k1\tk2\n D1  D2   D3 k3",
      2L -> "D1 D2 D3"), minLen = 3)
    assert(got(1L) == ((6L, 3L, "k1 k2 k3")))
    assert(got(2L) == ((3L, 3L, "")))
  }

  test("empty and blank docs pass through") {
    val got = run(Seq(1L -> "", 2L -> "   ", 3L -> "w1 w2 w3 w4"), minLen = 3)
    assert(got(1L) == ((0L, 0L, "")))
    assert(got(2L) == ((0L, 0L, "")))
    assert(got(3L) == ((4L, 0L, "w1 w2 w3 w4")))
  }
}
