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

  test("sequencePack invariants: contiguous coverage per source, spans match token math") {
    val fixture = Seq(
      (1L, "s1", (1 to 300).map(i => s"a$i").mkString(" ")),  // 300 tokens
      (2L, "s1", (1 to 400).map(i => s"b$i").mkString(" ")),  // straddles
      (3L, "s1", ""),                                          // dropped
      (4L, "s2", (1 to 100).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sequencePack(fixture, seqLen = 256)
      .orderBy("source", "doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toList
    // s1: doc1 tokens 0..299 -> first seq 0, touches seqs 0..1 (2);
    //     doc2 tokens 300..699 -> first seq 1, touches 1..2 (2)
    // s2: doc4 tokens 0..99 -> seq 0 only
    assert(got == List(
      (1L, "s1", 300L, 0L, 2L),
      (2L, "s1", 400L, 1L, 2L),
      (4L, "s2", 100L, 0L, 1L)), s"got $got")
    // invariant on real data: concatenation is gapless \u2014 each doc's first
    // sequence is within one of its predecessor's last touched sequence
    val real = TextAnalysis.sequencePack(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), seqLen = 128)
      .orderBy("source", "doc_id")
      .as[(Long, String, Long, Long, Long)].collect()
    real.sliding(2).foreach {
      case Array((_, sa, _, fa, na), (_, sb, _, fb, _)) if sa == sb =>
        val lastA = fa + na - 1
        assert(fb == lastA || fb == lastA + 1,
          s"gap in packing: doc ends in seq $lastA, next starts at $fb")
      case _ => ()
    }
  }

  test("mixtureBalance: over-represented stratum is downsampled toward uniform") {
    val docs = (1L to 1000L).map(i =>
      (i, if (i % 10 < 8) "big" else "small")).toDF("doc_id", "source")
    val got = graft.ops.Curate.mixtureBalance(docs)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // target N/k = 500 each: 'small' (200 docs, rate 1) all kept;
    // 'big' (800 docs, rate 0.625) lands near 500 (md5 sampling noise)
    assert(got("small") == 200L, s"under-represented stratum must keep all: $got")
    assert(got("big") > 400L && got("big") < 600L,
      s"over-represented stratum must sample toward 500: $got")
  }

  test("winnow: == local simulation; window coverage; shared runs share a fp") {
    val k = 4; val w = 5; val p = 1000000007L
    // deterministic pseudo-random token streams + one planted shared run
    def toks(seed: Long, n: Int): Seq[String] =
      (0 until n).map(i => s"t${(seed * 131 + i * 7919) % 50}")
    val shared = toks(99, 12) // >= k+w-1=8 tokens -> must collide
    val corpus = Seq(
      (1L, (toks(1, 40) ++ shared ++ toks(2, 30)).mkString(" ")),
      (2L, (toks(3, 25) ++ shared ++ toks(4, 45)).mkString(" ")),
      (3L, toks(5, 60).mkString(" ")),
      (4L, toks(6, 7).mkString(" ")),   // below k+w-1: no fingerprints
      (5L, "same same same same same same same same same same")) // tie run
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.winnow(df, k, w)
      .as[(Long, Long, Long)].collect().toSet
    // local reference: same algorithm in plain Scala
    val exp = corpus.flatMap { case (id, text) =>
      val tv = text.split("\\s+").filter(_.nonEmpty)
        .map(t => t.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % p))
      if (tv.length < k + w - 1) Seq.empty
      else {
        val gh = tv.sliding(k).map(_.foldLeft(0L)((a, b) => (a * 31 + b) % p)).toArray
        (0 to gh.length - w).flatMap { j =>
          val win = gh.slice(j, j + w)
          val mn = win.min
          val pos = j + win.lastIndexOf(mn) + 1 // 1-based gram index
          Seq((id, pos.toLong, mn))
        }.distinct
      }
    }.toSet
    assert(got == exp, s"diff: ${(got diff exp) ++ (exp diff got)}")
    assert(!got.exists(_._1 == 4L), "sub-threshold doc must emit nothing")
    // coverage guarantee: every window of w grams contains a selected pos
    for ((id, rows) <- got.groupBy(_._1)) {
      val sel = rows.map(_._2)
      val m = corpus.find(_._1 == id).get._2.split("\\s+").count(_.nonEmpty) - k + 1
      for (j <- 1 to m - w + 1)
        assert(sel.exists(s => s >= j && s < j + w), s"doc $id window $j uncovered")
    }
    // the planted run yields at least one identical fp in docs 1 and 2
    val f1 = got.filter(_._1 == 1L).map(_._3)
    val f2 = got.filter(_._1 == 2L).map(_._3)
    assert((f1 intersect f2).nonEmpty, "shared run must share a fingerprint")
    // tie run: rightmost-min rule picks ONE stable pos per window
    assert(got.count(_._1 == 5L) > 0)
  }

  test("winnowPairs: planted shared run pairs up; df cap kills template pairs") {
    val shared = (0 until 30).map(i => s"sh$i")
    def rnd(seed: Int, n: Int) = (0 until n).map(i => s"u${seed}x$i")
    val docs = Seq(
      (1L, (rnd(1, 20) ++ shared ++ rnd(2, 20)).mkString(" ")),
      (2L, (rnd(3, 15) ++ shared ++ rnd(4, 25)).mkString(" ")),
      (3L, rnd(5, 60).mkString(" "))).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"got ${pairs.toSeq}")
    assert(pairs.head._3 >= 1)
    // a template prefix in EVERY doc is df-capped out: no pair explosion
    val tmpl = (0 until 40).map(i => s"T$i")
    val many = (1 to 12).map(i =>
        (i.toLong, (tmpl ++ rnd(100 + i, 30)).mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextAnalysis.winnowPairs(many, minShared = 1, maxDocsPerFp = 5)
      .isEmpty, "template fps above the df cap must not generate pairs")
  }

  test("winnow + fingerprint: non-ASCII hashes codepoints, cross-engine stable") {
    // round-6 advice follow-up: the advice assumed Spark's ascii() is the
    // SIGNED first UTF-8 byte (negative on multi-byte chars, corrupting
    // the pos*2e9+fp encoding). Probe-verified FALSE on Spark 4: ascii()
    // returns the full codepoint \u2014 exactly DuckDB's semantics \u2014 so the
    // polynomial hashes are non-negative and engine-aligned on BMP text
    // with no masking. This pins that: Spark == the codepoint model.
    val k = 4; val w = 5; val p = 1000000007L
    def lead(c: Char): Long = c.toLong // BMP codepoint == UTF-16 unit
    val words = Seq("caf\u00e9", "m\u00fcnchen", "stra\u00dfe", "\u00fcber",
      "\u00e9l\u00e8ve", "na\u00efve", "gar\u00e7on", "fa\u00e7ade",
      "r\u00e9sum\u00e9", "touch\u00e9")
    val text = (words ++ words.reverse).mkString(" ") // 20 tokens >= k+w-1
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val expFp = text.split("\\s+").filter(_.nonEmpty)
      .foldLeft(0L)((acc, t) => (acc * 31 + t.length * 131 + lead(t.head)) % p)
    val gotFp = TextAnalysis.fingerprints(df).select("fp").as[Long].head()
    assert(gotFp == expFp && gotFp >= 0)
    val got = TextAnalysis.winnow(df, k, w).as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got.forall(r => r._2 >= 1 && r._3 >= 0),
      "winnow fps must stay non-negative on non-ASCII text")
    val tv = text.split("\\s+").filter(_.nonEmpty)
      .map(t => t.foldLeft(0L)((a, c) => (a * 131 + lead(c)) % p))
    val gh = tv.sliding(k).map(_.foldLeft(0L)((a, b) => (a * 31 + b) % p)).toArray
    val exp = (0 to gh.length - w).map { j =>
      val win = gh.slice(j, j + w); val mn = win.min
      (1L, (j + win.lastIndexOf(mn) + 1).toLong, mn)
    }.distinct.toSet
    assert(got == exp, s"diff: ${(got diff exp) ++ (exp diff got)}")
  }

  test("winnow: native expression == the HOF plan it replaced (ties, unicode, astral)") {
    // round-7 regression gate: WinnowEncodings must be value-identical to
    // the round-6 transform/aggregate formulation, which the q110/q111
    // DuckDB oracles mirror. Fixture stresses tie runs, multi-byte BMP,
    // an astral char (codepoint iteration), tabs/newlines as separators,
    // and a sub-threshold doc.
    val k = 4; val w = 5; val p = 1000000007L
    val corpus = Seq(
      (1L, (1 to 30).map(i => s"w${i % 11}").mkString(" ")),
      (2L, "same same same same same same same same same same"),
      (3L, "café straße 𝄞 clef 中文 mixed ascii tokens here now ok end"),
      (4L, "too short to emit"),
      (5L, (1 to 40).map(i => s"t${(i * 7919) % 50}").mkString("\t") + "\n trailing  runs"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnow(corpus, k, w)
      .as[(Long, Long, Long)].collect().toSet
    // the exact round-6 HOF plan, inlined
    val hof = {
      val tvB = corpus.select(col("doc_id"), inline(array(struct(
          transform(TextAnalysis.tokens(col("text")),
            t => aggregate(split(t, ""), lit(0L),
              (a, c) => (a * 131L + ascii(c).cast("long")) % p))
            .as("tv")))))
        .where(size(col("tv")) >= k + w - 1)
      val ghB = tvB.select(col("doc_id"), inline(array(struct(
        transform(sequence(lit(1), size(col("tv")) - (k - 1)),
          i => aggregate(slice(col("tv"), i, lit(k)), lit(0L),
            (a, b) => (a * 31L + b) % p)).as("gh")))))
      ghB.select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("gh")) - (w - 1)), j => {
            val win = slice(col("gh"), j, lit(w))
            val mn = array_min(win)
            (j.cast("long") + w - array_position(reverse(win), mn)) * 2000000000L + mn
          }))).as("enc"))
        .select(col("doc_id"), expr("CAST(enc DIV 2000000000 AS BIGINT)").as("pos"),
          (col("enc") % 2000000000L).as("fp"))
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(got == hof, s"diff: ${(got diff hof) ++ (hof diff got)}")
    assert(!got.exists(_._1 == 4L))
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

  test("spanCorrupt: rate extremes, sentinel order, lossless round-trip") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "solo"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    // rate 0: nothing masked — inputs are the rejoined tokens, no spans
    val none = TextAnalysis.spanCorrupt(docs, rate = 0.0)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(none.keySet == Set(1L, 2L, 3L), "token-less docs vanish")
    assert(none(1L)._2 == "the quick brown fox jumps over the lazy dog again and again")
    assert(none(1L)._3 == "" && none(1L)._4 == 0L)
    // rate 1: everything masked — one span holding the whole doc
    val all = TextAnalysis.spanCorrupt(docs, rate = 1.0)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(all(2L)._2 == "<extra_id_0>")
    assert(all(2L)._3 == "<extra_id_0> alpha beta gamma delta epsilon zeta eta theta")
    assert(all(2L)._4 == 1L)
    // default rate: splicing each target span back over its sentinel
    // reproduces the original token stream, and sentinels count 0..n-1
    val mid = TextAnalysis.spanCorrupt(docs, rate = 0.5)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    val sentRe = "<extra_id_(\\d+)>".r
    for ((id, (_, inp, tgt, n)) <- mid) {
      val spans = sentRe.split(tgt).toSeq.map(_.trim).filter(_.nonEmpty)
      val sentIds = sentRe.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
      assert(sentIds == (0 until n.toInt), s"doc $id target sentinels")
      var rebuilt = inp
      for ((k, span) <- sentIds.zip(spans))
        rebuilt = rebuilt.replace(s"<extra_id_$k>", span)
      val orig = docs.where($"doc_id" === id).as[(Long, String)].head()._2
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == orig, s"doc $id round-trip")
    }
    // deterministic under repartition
    val again = TextAnalysis.spanCorrupt(docs.repartition(5), rate = 0.5)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == mid)
  }

  test("encodingReport: each signal isolated, verdict precedence, clean text untouched") {
    val docs = Seq(
      (1L, "perfectly clean ascii prose here"),
      (2L, "two bad�chars� here"),            // damaged via U+FFFD
      (3L, "bell and esc chars"),           // damaged via ctrl
      (4L, "tab\tand\nnewline\rare fine"),              // \t\n\r NOT ctrl
      (5L, "cafÃ© naÃ¯ve seÃ±or â€™ â€œ â€”"),          // all six artifacts
      (6L, "moji Ã© plus ctrl too")                 // damaged beats suspect
    ).toDF("doc_id", "text")
    val m = TextAnalysis.encodingReport(docs)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m(1L) == ((0L, 0L, 0L, "clean")))
    assert(m(2L) == ((2L, 0L, 0L, "damaged")))
    assert(m(3L) == ((0L, 0L, 2L, "damaged")))
    assert(m(4L) == ((0L, 0L, 0L, "clean")))
    assert(m(5L) == ((0L, 6L, 0L, "suspect")))
    assert(m(6L) == ((0L, 1L, 1L, "damaged")))
  }

  test("vocabularyGrowth: hand-computed Chao1 and head coverage") {
    // counts: a:2 b:3 c:1 d:1 e:1 -> V=5, N=8, f1=3, f2=1
    // chao1 = 5 + (3*2) div (2*2) = 6
    // topK=2 -> b(3) + a(2) = 5 -> coverage = 5e6 div 8 = 625000
    val docs = Seq((1L, "a a b b"), (2L, "b c d e")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabularyGrowth(docs, topK = 2).head()
    assert(r.getLong(0) == 5L)   // v_obs
    assert(r.getLong(1) == 8L)   // n_tokens
    assert(r.getLong(2) == 3L)   // f1
    assert(r.getLong(3) == 1L)   // f2
    assert(r.getLong(4) == 5L)   // top_tf
    assert(r.getLong(5) == 6L)   // chao1_est
    assert(r.getLong(6) == 625000L) // coverage_ppm
    // saturated corpus (no singletons): chao1 == v_obs
    val sat = Seq((1L, "x x y y")).toDF("doc_id", "text")
    val r2 = TextAnalysis.vocabularyGrowth(sat, topK = 10).head()
    assert(r2.getLong(2) == 0L && r2.getLong(5) == r2.getLong(0))
  }

  test("scriptMix: hand-computed ppm per class; mixed flag fires both ways") {
    // "ab1 \u043f\u0440 \u4e2d": chars=8, space=2, nb=6 ->
    // lat 2/6, dig 1/6, cyr 2/6, cjk 1/6, other 0
    val docs = Seq(
      (1L, "ab1 \u043f\u0440 \u4e2d"),
      (2L, "only latin words"),
      (3L, "\u043f\u0440\u0438\u0432"),   // pure cyrillic: no mix
      (4L, "")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.scriptMix(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(m(1L) == ((8L, 333333L, 166666L, 333333L, 166666L, 0L, true)))
    assert(m(2L)._2 == 1000000L && !m(2L)._7) // 16 chars, 2 spaces -> nb=14, all Latin
    assert(m(3L) == ((4L, 0L, 0L, 1000000L, 0L, 0L, false)))
    assert(m(4L) == ((0L, 0L, 0L, 0L, 0L, 0L, false))) // nb floored to 1
  }

  test("compressionReport: shared volume denominators, per-family tokens, absent docs count volume") {
    // "héllo" is 5 chars / 6 UTF-8 bytes — bytes and chars must differ
    val docs = Seq(
      (1L, "héllo", "A"),
      (2L, "abcd", "A"),
      (3L, "xy", "B"),
      (4L, null.asInstanceOf[String], "B")
    ).toDF("doc_id", "text", "source")
    val famX = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("doc_id", "n_tokens")
    val famY = Seq((1L, 5L)).toDF("doc_id", "n_tokens") // skips docs 2-4
    val got = TextAnalysis.compressionReport(docs,
      Seq("x" -> famX, "y" -> famY)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // A: 9 chars, 10 bytes; x: 5 tokens -> 1.8 chars/tok, 2.0 bytes/tok
    assert(got(("A", "x")) == ((5L, 9L, 10L, 1800000L, 2000000L)))
    // y skipped doc 2: its volume still counts against y's 5 tokens
    assert(got(("A", "y")) == ((5L, 9L, 10L, 1800000L, 2000000L)))
    // B under y: zero tokens -> NULL ratios, volume intact (NULL text = 0)
    assert(got(("B", "x")) == ((1L, 2L, 2L, 2000000L, 2000000L)))
    assert(got(("B", "y")) == ((0L, 2L, 2L, -1L, -1L)))
    assert(got.size == 4)
  }
}
