package graft

import org.apache.spark.sql.functions._
import graft.ops.Curate

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String, form: String = "NFC"): String =
    Curate.normalizeText(Seq((1L, s)).toDF("doc_id", "text"), form = form)
      .select("text").as[String].head()

  test("NFC composes decomposed accents; NFKC folds compatibility forms") {
    // "cafe" + U+0301 combining acute -> composed U+00E9
    assert(norm("cafe\u0301") == "caf\u00e9")
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi" under NFKC, untouched by NFC
    assert(norm("\ufb01n", form = "NFKC") == "fin")
    assert(norm("\ufb01n") == "\ufb01n")
  }

  test("controls stripped (tab/newline survive), whitespace collapsed, edges trimmed") {
    assert(norm("a\u0000bcd") == "abcd")
    assert(norm("a \t b\t\tc") == "a b c")
    assert(norm("  a b  ") == "a b")
    // newline is content, not collapsible whitespace; the space before it
    // survives as a single collapsed space
    assert(norm(" a \n b ") == "a \n b")
    assert(norm("") == "")
    // a control inside a whitespace run must not produce two spaces
    assert(norm("a \u0007 b") == "a b")
  }

  test("stripHtml: tags become spaces; entities decode with &amp; last") {
    val got = Seq((1L, "<p>a</p><br/>b &amp;lt; &lt;x&gt; &quot;q&quot;&#39;s&#39;&nbsp;!"))
      .toDF("doc_id", "text")
      .select(Curate.stripHtml(col("text")).as("t")).as[String].head()
    // <p>/</p>/<br/> -> single spaces; &amp;lt; must end as literal &lt;
    // (NOT "<"), &lt;x&gt; -> <x> which is NOT re-stripped (tags went first)
    assert(got == " a  b &lt; <x> \"q\"'s' !", s"got [$got]")
  }

  test("normalizeText is a stable dedup key: composed == decomposed after NFC") {
    val df = Seq((1L, "re\u0301sume\u0301 x"), (2L, "r\u00e9sum\u00e9  x"))
      .toDF("doc_id", "text")
    val keys = Curate.normalizeText(df).select("text").as[String].collect().toSet
    assert(keys.size == 1, keys.toString)
  }
}
