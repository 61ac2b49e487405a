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
}
