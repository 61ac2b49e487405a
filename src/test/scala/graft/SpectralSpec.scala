package graft

import graft.ops.TextAnalysis

/** Spectral direction of the positive-PPMI token graph (q226):
  * hand-computed octave matrices, infinity-norm decay across decoupled
  * components, diagonal-once semantics, and the empty-matrix shape. */
class SpectralSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    TextAnalysis.spectralTokens(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("symmetric components with equal octaves hold the fixed point") {
    // docs "a b" and "c d": each pair ratio = 1000·4000/10⁶ = 4 →
    // octave 2 both; every node's w is equal each round, so the
    // infinity-normalized iterate never moves off v0 = 2^20
    val got = run(Seq(1L -> "a b", 2L -> "c d"))
    assert(got == Map(
      "a" -> (1L, 2L, 1048576L), "b" -> (1L, 2L, 1048576L),
      "c" -> (1L, 2L, 1048576L), "d" -> (1L, 2L, 1048576L)))
  }

  test("weaker component decays by the octave ratio each round") {
    // "a b"×2 + "c d": ratio(a,b) = 2000·6000/(2000·2000) = 3 →
    // octave 1; ratio(c,d) = 1000·6000/(1000·1000) = 6 → octave 2.
    // Per round max w sits on the c—d side (2·v), so the a—b side
    // halves: after 8 rounds v_a = 2^20 / 2^8 = 4096.
    val got = run(Seq(1L -> "a b", 2L -> "a b", 3L -> "c d"))
    assert(got == Map(
      "a" -> (1L, 1L, 4096L), "b" -> (1L, 1L, 4096L),
      "c" -> (1L, 2L, 1048576L), "d" -> (1L, 2L, 1048576L)))
  }

  test("diagonal pairs contribute ONE edge, not two") {
    // "a a" + "b c": ratio(a,a) = 1000·3000/(1000·1000) = 3 → octave 1
    // (the self-loop), ratio(b,c) = 3 → octave 1; all w equal → fixed
    // point, and a's degree/strength must count the loop once
    val got = run(Seq(1L -> "a a", 2L -> "b c"))
    assert(got == Map(
      "a" -> (1L, 1L, 1048576L),
      "b" -> (1L, 1L, 1048576L), "c" -> (1L, 1L, 1048576L)))
  }

  test("no positive-PPMI pair yields an empty frame with the full schema") {
    // lone doc "a a": the only pair is the diagonal at ratio exactly 1
    // → octave 0 → clamped out; the frame must still carry the schema
    val df = TextAnalysis.spectralTokens(Seq(1L -> "a a").toDF("doc_id", "text"))
    assert(df.columns.toSeq ==
      Seq("token", "n_edges", "strength", "spec_q20"))
    assert(df.count() == 0L)
  }
}
