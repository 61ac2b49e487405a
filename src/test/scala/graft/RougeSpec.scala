package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class RougeSpec extends SparkTestBase {
  import spark.implicits._

  test("rougeLPairs: hand-computed LCS and F-measure") {
    val docs = Seq(
      (1L, "write a story about a dog"),
      (2L, "write a poem about a cat"),    // LCS with 1: write,a,about,a = 4
      (3L, "dog a about story a write"),   // reversed: LCS with 1 = 3 (a about a)
      (4L, "write a story about a dog")    // verbatim copy of 1
    ).toDF("doc_id", "text")
    val got = Dedup.rougeLPairs(docs, maxTokens = 16, minRougePpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // (1,2): la=lb=6, lcs=4 -> rouge = 8e6/12 = 666666
    assert(got((1L, 2L)).getLong(4) == 4L, got((1L, 2L)).toString)
    assert(got((1L, 2L)).getLong(5) == 666666L)
    // (1,4): verbatim -> lcs 6, rouge exactly 1e6
    assert(got((1L, 4L)).getLong(4) == 6L)
    assert(got((1L, 4L)).getLong(5) == 1000000L)
    // (1,3): reversal kills most in-order matches; the best surviving
    // chain is a(1) about(3) a(4) in doc1 vs a(1) about(2) a(4) in doc3
    assert(got((1L, 3L)).getLong(4) == 3L, got((1L, 3L)).toString)
    // threshold: at the Self-Instruct 0.7 gate only the verbatim pair survives
    val gated = Dedup.rougeLPairs(docs, maxTokens = 16, minRougePpm = 700000L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(gated == Set((1L, 4L)), gated.toString)
  }

  test("token cap: only the first maxTokens enter the DP") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w")
    ).toDF("doc_id", "text")
    val capped = Dedup.rougeLPairs(docs, maxTokens = 4, minRougePpm = 0L).head()
    assert(capped.getLong(2) == 4L && capped.getLong(3) == 4L)
    assert(capped.getLong(4) == 4L, "first-4 prefixes are identical")
    assert(capped.getLong(5) == 1000000L)
  }

  test("real corpus plants: verbatim and prefix copies surface") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = base.where(col("doc_id") < 80)
      .unionByName(base.where(col("doc_id") < 8)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val pairs = Dedup.rougeLPairs(all, maxTokens = 16, minRougePpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    (0L to 7L).foreach { j =>
      val r = pairs.get((j, 1000000L + j))
      assert(r.contains(1000000L), s"verbatim plant $j: $r")
    }
  }
}
