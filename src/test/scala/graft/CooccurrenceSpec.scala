package graft

import graft.ops.TextAnalysis

/** GloVe-style co-occurrence counts (q214): hand-computed windows,
  * pair normalization, vocab restriction, doc-boundary isolation. */
class CooccurrenceSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int = 3, topK: Int = 256) =
    TextAnalysis.cooccurrence(docs.toDF("doc_id", "text"), window, topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("hand-computed window pairs with harmonic milli weights") {
    // "a b c a": (a,b,1)(a,c,2)(a,a,3)(b,c,1)(b,a,2)(c,a,1)
    // normalized: (a,a):333 | (a,b): 1000+500 | (a,c): 500+1000 | (b,c): 1000
    val got = run(Seq(1L -> "a b c a"))
    assert(got == Map(
      ("a", "a") -> (1L, 333L),
      ("a", "b") -> (2L, 1500L),
      ("a", "c") -> (2L, 1500L),
      ("b", "c") -> (1L, 1000L)))
  }

  test("both ends must sit in the top-k vocabulary") {
    // freq: xx=2, x=1; topK=1 keeps only xx -> the lone surviving pair
    // is the (xx, xx) adjacency
    val got = run(Seq(1L -> "x xx xx"), topK = 1)
    assert(got == Map(("xx", "xx") -> (1L, 1000L)))
  }

  test("windows never cross document boundaries") {
    val got = run(Seq(1L -> "a b", 2L -> "c d"))
    assert(got.keySet == Set(("a", "b"), ("c", "d")),
      "no pair may span the doc boundary")
  }

  test("window=1 restricts to adjacencies") {
    val got = run(Seq(1L -> "a b c"), window = 1)
    assert(got == Map(("a", "b") -> (1L, 1000L), ("b", "c") -> (1L, 1000L)))
  }
}
