package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Text-analysis operator semantics, including the empty/whitespace-only
  * fixtures ADVICE.md round 1 asked to plant (testdata has none). */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox", "en", "s0"),
    (2L, "", "en", "s0"),
    (3L, "   ", "en", "s0"),
    (4L, "der hund und die katze nicht", "de", "s1"),
    (5L, "a1 b22 c333", "en", "s1")
  ).toDF("doc_id", "text", "lang", "source")

  test("tokenStats: counts, avg token length; blank text => 0 tokens, 0 avg") {
    val got = TextAnalysis.tokenStats(docs).orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_tokens") == 4)
    assert(got(0).getAs[Double]("avg_token_len") == (3 + 5 + 5 + 3) / 4.0)
    assert(got(1).getAs[Int]("n_tokens") == 0)
    assert(got(1).getAs[Double]("avg_token_len") == 0.0)
    assert(got(2).getAs[Int]("n_tokens") == 0, "whitespace-only is empty")
    assert(got(4).getAs[Double]("avg_token_len") == (2 + 3 + 4) / 3.0)
  }

  test("qualityScore: stopword ratio, digits, alpha ratio; blank-safe") {
    val got = TextAnalysis.qualityScore(docs).orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("stop_hits") == 1) // "the"
    assert(got(0).getAs[Double]("stop_ratio") == 0.25)
    assert(got(4).getAs[Int]("n_digits") == 6)
    assert(got(1).getAs[Int]("n_tokens") == 0)
    assert(got(1).getAs[Double]("stop_ratio") == 0.0)
  }

  test("langId votes marker words with deterministic tie-break en>de>fr") {
    val got = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(got(0).getAs[String]("lang_guess") == "en")
    assert(got(3).getAs[String]("lang_guess") == "de")
    assert(got(1).getAs[String]("lang_guess") == "en", "zero hits everywhere ties to en")
  }

  test("fingerprint: deterministic, order-sensitive, blank => 0") {
    val a = Seq((1L, "x yy zzz")).toDF("doc_id", "text")
    val b = Seq((1L, "zzz yy x")).toDF("doc_id", "text")
    val fa = TextAnalysis.fingerprints(a).select("fp").as[Long].head()
    val fa2 = TextAnalysis.fingerprints(a).select("fp").as[Long].head()
    val fb = TextAnalysis.fingerprints(b).select("fp").as[Long].head()
    assert(fa == fa2)
    assert(fa != fb, "token order must matter")
    val blank = TextAnalysis.fingerprints(Seq((1L, " ")).toDF("doc_id", "text"))
      .select("fp").as[Long].head()
    assert(blank == 0L)
  }
}
