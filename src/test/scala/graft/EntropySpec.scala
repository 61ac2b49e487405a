package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

/** Unigram-entropy quality gate: hand-computed integer surprisal,
  * normalization bounds, verdict tiers, the shuffled-spam case n-gram
  * repetition cannot see, degenerate inputs, and the zero-shuffle plan. */
class EntropySpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    Quality.unigramEntropy(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap

  test("hand-computed surprisal: 'a a b' -> n=3, c={2,1}, surp=0+1") {
    val m = run(1L -> "a a b")
    // a: 3 div 2 = 1, floor log2 = 0; b: 3 div 1 = 3, floor log2 = 1
    assert(m(1L) == ((3L, 2L, 1L, 1L * 1000 / (3 * 1), "mixed")))
  }

  test("all-unique tokens hit the permille ceiling exactly") {
    val m = run(1L -> "one two three four five six seven eight")
    // n=8, every c=1: surp = 8*ilog2(8) = 24; norm = 24000/(8*3) = 1000
    assert(m(1L) == ((8L, 8L, 24L, 1000L, "diverse")))
  }

  test("wall-to-wall repetition scores zero") {
    val m = run(1L -> Seq.fill(40)("spam").mkString(" "))
    assert(m(1L) == ((40L, 1L, 0L, 0L, "repetitive")))
  }

  test("shuffled template spam: low entropy verdict despite varied 2-grams") {
    // 20 tokens x 10 copies, interleaved so consecutive 2-grams all differ
    // — the distribution cannot be shuffled away even when gram-level
    // repetition signals stay quiet
    val toks = (0 until 200).map(i => s"w${i % 20}")
    val m = run(1L -> toks.mkString(" "))
    // n=200, c=10 each: surp = 200*ilog2(20) = 800; bound 200*ilog2(200)=1400
    assert(m(1L)._3 == 800L && m(1L)._4 == 800L * 1000 / 1400)
    assert(m(1L)._5 == "mixed") // and NEVER diverse
  }

  test("degenerates: empty, blank, one token -> short; case folds") {
    val m = run(1L -> "", 2L -> " \t\n ", 3L -> "word", 4L -> "Foo FOO foo bar")
    assert(m(1L) == ((0L, 0L, 0L, 0L, "short")))
    assert(m(2L) == ((0L, 0L, 0L, 0L, "short")))
    assert(m(3L) == ((1L, 1L, 0L, 0L, "short")))
    // lowercase folding merges Foo/FOO/foo: n=4, c={3,1} -> 3*0 + 1*2 = 2
    assert(m(4L)._1 == 4L && m(4L)._2 == 2L && m(4L)._3 == 2L)
  }

  test("control-char padding: split-then-filter, no trim divergence") {
    //  is not \s: it is a TOKEN, exactly as the oracle's regex sees it
    val m = run(1L -> " a b")
    assert(m(1L)._1 == 3L && m(1L)._2 == 3L)
  }

  test("plan: one scan, zero exchanges") {
    val df = Quality.unigramEntropy(Seq((1L, "a b c")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"),
      s"entropy gate must be scan-side:\n$plan")
  }
}
