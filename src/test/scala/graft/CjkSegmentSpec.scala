package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, Unigram}

/** No-space-script segmentation: hand-computed bigram/boundary cases,
  * Column-vs-local twin equivalence, and the scriptAware fertility
  * wiring (a pure-Han doc must read plausible words, not one token).
  */
class CjkSegmentSpec extends SparkTestBase {
  import spark.implicits._

  private def segTokens(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(TextAnalysis.tokensSegmented(col("t")).as("x"))
      .head().getSeq[String](0)

  test("segmentation: hand-computed bigram and boundary cases") {
    // even run -> clean bigrams; odd run -> trailing single
    assert(segTokens("一丁丂七") == Seq("一丁", "丂七"))
    assert(segTokens("一丁丂七万") == Seq("一丁", "丂七", "万"))
    // script boundaries break off Latin neighbors
    assert(segTokens("abc一丁def") == Seq("abc", "一丁", "def"))
    assert(segTokens("mix アイウエオカ tail") ==
      Seq("mix", "アイ", "ウエ", "オカ", "tail"))
    // Thai is a no-space script too
    assert(segTokens("ไทยคฏ") == Seq("ไท", "ยค", "ฏ"))
    // plain text untouched (modulo existing whitespace)
    assert(segTokens("plain old text") == Seq("plain", "old", "text"))
    // alternating single chars still split at every boundary
    assert(segTokens("a一b") == Seq("a", "一", "b"))
  }

  test("Column form and JVM-local twin agree on an adversarial battery") {
    val cases = Seq("", "一", "一丁丂", "a一", "一a", " 一 丁 ", "aä一ö丁",
      "ไทย一アtextไ", "x\ty一\n丁z", "。一丁", "一。丁")
    val viaCol = cases.toDF("t")
      .select(col("t"), TextAnalysis.segmentScripts(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach(c =>
      assert(viaCol(c) == TextAnalysis.segmentScriptsLocal(c),
        s"column/local drift on <$c>"))
  }

  test("scriptAware fertility: a pure-Han doc reads words, not one token") {
    val docs = Seq(
      (1L, "srcA", "一丁丂七万丈三上下丌"), // 10 chars, no spaces
      (2L, "srcB", "the quick brown fox jumps"))
      .toDF("doc_id", "source", "text")
    val vocab = Unigram.trainVocab(docs)
    val aware = Unigram.fertilityReport(docs, vocab, scriptAware = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val blind = Unigram.fertilityReport(docs, vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // scriptAware: 5 bigram words; the q34 regex reads 10 single-char
    // words (each punctuation-class char its own pre-token)
    assert(aware("srcA") == 5L)
    assert(blind("srcA") == 10L)
    // Latin text: WS words (5) vs regex pre-tokens (5 here — no punct)
    assert(aware("srcB") == 5L && blind("srcB") == 5L)
  }

  test("segmented token budget cost: CJK docs pay real token counts") {
    val df = Seq((1L, "一丁丂七万丈"), (2L, "two words"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.tokenCountSegmented(col("text")).as("seg"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(df(1L) == ((1, 3))) // one WS blob -> three bigrams
    assert(df(2L) == ((2, 2)))
  }
}
