package graft

import graft.ops.{Cdc, TextAnalysis}

class CdcVocabSpec extends SparkTestBase {
  import spark.implicits._

  test("latestImage: latest version wins, deletes drop the key, redelivery collapses") {
    val changes = Seq(
      // key 1: insert then update -> update survives
      (1L, 1L, 100L, "c"),
      (1L, 2L, 200L, "u"),
      // key 2: insert then delete -> gone
      (2L, 3L, 100L, "c"),
      (2L, 4L, 300L, "d"),
      // key 3: delete arrives BEFORE a late older insert -> still gone
      (3L, 6L, 500L, "d"),
      (3L, 5L, 400L, "c"),
      // key 4: redelivered identical change -> one row
      (4L, 7L, 100L, "c"),
      (4L, 7L, 100L, "c")
    ).toDF("k", "change_id", "ver", "op")
    val got = Cdc.latestImage(changes, Seq("k"), Seq("ver", "change_id"))
      .select("k", "change_id", "op").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "u"), (4L, 7L, "c")))
  }

  test("vocabulary: tf sums occurrences, df counts documents, order deterministic") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana banana cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, k = 2)
      .as[(String, Long, Long)].collect().toList
    // banana tf=4 df=2; apple tf=3 df=2 — cherry (tf=2) cut by k
    assert(got == List(("banana", 4L, 2L), ("apple", 3L, 2L)))
  }

  test("tfidfTopTerms: rare terms outrank common ones, k bounds per doc") {
    val docs = Seq(
      (1L, "common rare1 rare1"),
      (2L, "common rare2 rare2"),
      (3L, "common filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, k = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // 'common' df=3 -> idf 1.0; rare terms df=1 -> idf 2.0
    // doc1: rare1 2*2=4 > common 1; doc3: filler 2 > common 1
    assert(got == Map(1L -> "rare1", 2L -> "rare2", 3L -> "filler"))
  }
}
