package graft

import graft.ops.TextAnalysis

/** Zipf rank-frequency fit (q205): hand-computed octave rollup and
  * least-squares line on constructed frequency ladders. */
class ZipfSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(docs: Seq[(Long, String)], topK: Int = 256) =
    TextAnalysis.zipfFit(docs.toDF("doc_id", "text"), topK).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("perfect power law: exact slope and intercept") {
    // freqs a=8 b=4 c=2 d=1 -> ranks 1..4
    // octave 0 (rank 1):   y = ilog2(8)            = 3000 milli
    // octave 1 (ranks 2,3): y = (1000*(2+1)) div 2 = 1500
    // octave 2 (rank 4):   y = ilog2(1)            = 0
    // points (0,3000) (1,1500) (2,0): slope -1500, intercept 3000
    val docs = Seq(
      1L -> "a a a a a a a a",
      2L -> "b b b b",
      3L -> "c c",
      4L -> "d")
    val got = fit(docs)
    assert(got(0L) == (1L, 3000L, -1500L, 3000L))
    assert(got(1L) == (2L, 1500L, -1500L, 3000L))
    assert(got(2L) == (1L, 0L, -1500L, 3000L))
    assert(got.size == 3)
  }

  test("frequency ties rank lexicographically before octave assignment") {
    // x=2 y=2 z=1 -> ranks x:1 y:2 z:3
    // octave 0: y_milli = 1000 (freq 2); octave 1: (1000*(1+0)) div 2 = 500
    // points (0,1000) (1,500): det = 2*1-1 = 1, slope -500, intercept 1000
    val got = fit(Seq(1L -> "x x y", 2L -> "y z"))
    assert(got(0L) == (1L, 1000L, -500L, 1000L))
    assert(got(1L) == (2L, 500L, -500L, 1000L))
  }

  test("topK caps the ranked head") {
    // 5 distinct tokens, topK=2 keeps ranks 1..2 only -> octaves 0 and 1
    val got = fit(Seq(1L -> "a a a b b c d e"), topK = 2)
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L)._2 == 1000L, "rank 1 is 'a' with freq 3, ilog2=1")
    assert(got(1L)._2 == 1000L, "rank 2 is 'b' with freq 2, ilog2=1")
  }

  test("degenerate single-octave frame yields NULL fit, not a crash") {
    val row = TextAnalysis.zipfFit(
      Seq((1L, "only")).toDF("doc_id", "text"), topK = 1).collect()
    assert(row.length == 1 && row.head.isNullAt(3) && row.head.isNullAt(4),
      "det=0 must NULL the fit on both engines")
  }

  test("heapsFit: hand-traced first positions, octave curve, exact fit") {
    // stream (doc_id order): a b | a c a | d b e  -> offsets 0, 2, 5
    // firsts: a@0 b@1 c@3 d@5 e@7 -> octaves 0:{a,b} 1:{c} 2:{d,e}
    // cum V = 2, 3, 5 -> y = 1000, 1000, 2000 at x = 1, 2, 3
    // n=3 sx=6 sy=4000 sxy=9000 sxx=14 det=6
    // slope = 3000 div 6 = 500; intercept = 2000 div 6 = 333 (truncated)
    val docs = Seq(
      1L -> "a b", 2L -> "a c a", 3L -> "d b e").toDF("doc_id", "text")
    val got = TextAnalysis.heapsFit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      0L -> (2L, 2L, 1000L, 500L, 333L),
      1L -> (1L, 3L, 1000L, 500L, 333L),
      2L -> (2L, 5L, 2000L, 500L, 333L)))
  }

  test("heapsFit: repartitioned input yields identical first positions") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 11} tok$i common")).toDF("doc_id", "text")
    val a = TextAnalysis.heapsFit(docs).collect().toSet
    val b = TextAnalysis.heapsFit(docs.repartition(13)).collect().toSet
    assert(a == b, "bounded-sort offsets must be partitioning-invariant")
  }

  test("heapsFit rejects negative doc ids loudly (packing guard)") {
    val bad = Seq(-1L -> "a b", 2L -> "c d").toDF("doc_id", "text")
    intercept[Exception] { TextAnalysis.heapsFit(bad).collect() }
  }
}
