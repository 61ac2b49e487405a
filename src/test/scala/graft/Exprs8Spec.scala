package graft

import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Direct unit coverage for the round-8 expressions (the q116/q129/q23b
  * oracles exercise them end-to-end; these pin the per-expression edge
  * semantics in isolation).
  */
class Exprs8Spec extends SparkTestBase {
  import spark.implicits._

  private def oneSeq[T](df: org.apache.spark.sql.DataFrame): Seq[T] =
    df.collect().head.getSeq[T](0).toList

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("md5Shingles: hex md5 of space-joined grams, case-sensitive") {
    val df = Seq("A b c d").toDF("t")
    val got = oneSeq[String](df.select(Exprs.md5Shingles(col("t"), 3)))
    val exp = Seq("A b c", "b c d").map { g =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got == exp)
    // engine-identical to SQL md5 of the same gram strings
    val sqlMd5 = one[String](df.select(md5(lit("A b c"))))
    assert(got.head == sqlMd5)
  }

  test("md5Shingles: short and blank docs emit NO grams (no degenerate)") {
    val got = Seq("a b", "", "   ").toDF("t")
      .select(Exprs.md5Shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(got.forall(_.isEmpty))
  }

  test("charGramBuckets: matches the polynomial fold on codepoints") {
    val P = 1000000007L
    val B = 2048
    val s = "héllo" // multi-byte é exercises codepoint (not UTF-16) walk
    val cps = s.codePoints().toArray.map(_.toLong)
    val exp = scala.collection.mutable.ArrayBuffer[Long]()
    for (i <- 1 until cps.length) {
      exp += (cps(i - 1) * 131L + cps(i)) % P % B
      if (i >= 2) exp += (((cps(i - 2) * 131L + cps(i - 1)) % P) * 131L + cps(i)) % P % B
    }
    val got = oneSeq[Long](Seq(s).toDF("t")
      .select(Exprs.charGramBuckets(col("t"), B)))
    assert(got == exp.toList)
  }

  test("charGramBuckets: under 2 codepoints => empty; astral pairs fold by codepoint") {
    val got = Seq("x", "", "😀😀😀").toDF("t")
      .select(Exprs.charGramBuckets(col("t"), 64)).as[Seq[Long]].collect()
    assert(got(0).isEmpty && got(1).isEmpty)
    // "😀😀😀" = 3 codepoints -> two 2-grams + one 3-gram, all defined
    assert(got(2).length == 3)
  }

  test("gopherRepetitionStats: struct fields on a hand-computed doc") {
    val r = Seq("a b a b a").toDF("t")
      .select(Exprs.gopherRepetitionStats(col("t")).as("s"))
      .selectExpr("s.n_words", "s.n_distinct", "s.top2_cnt", "s.top2_gram", "s.dup3_chars")
      .as[(Long, Long, Long, String, Long)].collect().head
    // 2-grams {a b:2, b a:2} -> tie to "a b"; 3-grams {a b a:2, b a b:1}
    // -> dup3 = 2 * 5
    assert(r == ((5L, 2L, 2L, "a b", 10L)))
  }

  test("langNbScore: argmax over shipped weights, null under 2 codepoints") {
    // 2 langs, 4 buckets; weight lang0 high on every bucket
    val w = Seq(Seq(5L, 5L, 5L, 5L), Seq(1L, 1L, 1L, 1L))
    val df = Seq("ab", "x").toDF("t")
      .select(Exprs.langNbScore(col("t"), Seq("aa", "bb"), w).as("s"))
      .selectExpr("s.lang_pred", "s.score")
    val rows = df.collect()
    assert(rows(0).getString(0) == "aa" && rows(0).getLong(1) == 5L) // one 2-gram
    assert(rows(1).isNullAt(0) || rows(1).anyNull) // sub-2-codepoint -> null struct
  }

  test("langNbScore: single astral codepoint (UTF-16 length 2) is null — no-evidence drop") {
    // "𝄞" has String.length 2 but is ONE codepoint: zero 2-grams exist.
    // Before the round-9 fix this returned (binary-smallest lang, 0)
    // instead of null, diverging from CharGramBuckets (empty array) and
    // the q23b oracle (doc dropped).
    val w = Seq(Seq(5L, 5L, 5L, 5L), Seq(1L, 1L, 1L, 1L))
    val rows = Seq("𝄞", "😀", "𝄞a").toDF("t")
      .select(Exprs.langNbScore(col("t"), Seq("aa", "bb"), w).as("s"))
      .collect()
    assert(rows(0).isNullAt(0), "single astral codepoint must be null")
    assert(rows(1).isNullAt(0), "single emoji must be null")
    assert(!rows(2).isNullAt(0), "astral+ascii is one 2-gram of evidence")
  }

  test("md5Shingles: control-char tokenization aligns with TextAnalysis.tokens") {
    // U+0001 <= U+0020 but is NOT regex \s: Java trim would have eaten it
    // and produced 1 token for U+0001-prefixed text; split-then-filter keeps it as
    // its own token (2 tokens), so gram positions align with the `_tk`
    // array exactSubstrDedup reassembles from (and with the oracle).
    val df = Seq("\u0001 abc def").toDF("t")
    val nToks = one[Int](df.select(size(graft.ops.TextAnalysis.tokens(col("t")))))
    assert(nToks == 3)
    val grams = oneSeq[String](df.select(Exprs.md5Shingles(col("t"), 3)))
    assert(grams.length == nToks - 3 + 1)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("\u0001 abc def".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(grams.head == exp)
    // leading/trailing \s whitespace still yields no phantom tokens
    val padded = oneSeq[String](Seq("  a b c \n").toDF("t")
      .select(Exprs.md5Shingles(col("t"), 3)))
    assert(padded.length == 1)
  }

  test("langNbScore: score ties break to the binary-smallest lang") {
    val w = Seq(Seq(3L, 3L), Seq(3L, 3L))
    val pred = Seq("zz").toDF("t")
      .select(Exprs.langNbScore(col("t"), Seq("zb", "za"), w).as("s"))
      .selectExpr("s.lang_pred").as[String].collect().head
    assert(pred == "za")
  }
}
