package graft

import graft.ops.Unigram

/** Unigram-LM tokenizer: the Viterbi DP pinned on hand-computed
  * examples (including the longer-piece tie rule and the UNK
  * fallback), the lossless/coverage invariants under a TRAINED
  * vocabulary, and the DataFrame pass's NULL-row and count contracts. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(w: String, v: Map[String, Long]) =
    Unigram.segmentWord(w, v, 4)

  test("segmentWord: maximum-likelihood split, hand-computed") {
    // "abc": ab|c = -2 + -3 = -5, abc = -5, a|b|c = -3 + -4 + -3 = -10
    // tie at -5 resolves to the LONGER final piece (cand*8 + k key)
    val v = Map("ab" -> -2L, "a" -> -3L, "b" -> -4L, "abc" -> -5L, "c" -> -3L)
    assert(seg("abc", v) == ((Vector("abc"), -5L)))
    // "abab": ab|ab = -4 beats every char path
    assert(seg("abab", v) == ((Vector("ab", "ab"), -4L)))
    // a genuinely better multi-piece split wins over the worse long piece
    val v2 = Map("ab" -> -1L, "c" -> -1L, "abc" -> -5L,
      "a" -> -9L, "b" -> -9L)
    assert(seg("abc", v2) == ((Vector("ab", "c"), -2L)))
  }

  test("segmentWord: out-of-vocabulary characters take the UNK score, never a multi-char hole") {
    val v = Map("a" -> -1L, "b" -> -1L)
    assert(seg("axb", v) == ((Vector("a", "x", "b"), -42L)))
    assert(seg("x", v) == ((Vector("x"), Unigram.UnkScore)))
    assert(seg("", v) == ((Vector.empty[String], 0L)))
  }

  test("trained vocab: scores are valid log2-probs, UNK stays strictly below the floor") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog and a rat")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(docs, vocabSize = 64, sampleDocs = 8)
    assert(vocab.nonEmpty && vocab.size <= 64)
    // every score in [-30, 0]; the -40 UNK can never outbid a piece
    vocab.foreach { case (p, s) =>
      assert(s >= -30L && s <= 0L, s"piece '$p' score $s outside [-30, 0]")
    }
    assert(vocab.toMap.contains("the") || vocab.toMap.contains("th"),
      "frequent substrings must make the vocabulary")
    // lossless + coverage: every corpus word reassembles from its pieces
    val vm = vocab.toMap
    Seq("the", "cat", "dogs", "zebra!").foreach { w =>
      val (pieces, _) = seg(w, vm)
      assert(pieces.mkString == w, s"'$w' must reassemble, got $pieces")
      pieces.foreach(p => assert(vm.contains(p) || p.length == 1,
        s"piece '$p' neither in vocab nor a single-char UNK"))
    }
  }

  test("segment: per-doc counts match the word-level DP; NULL text surfaces with zeros") {
    val docs = Seq(
      (1L, Some("aa bb aa")),
      (2L, Some("")),
      (3L, None)).toDF("doc_id", "text")
    val vocab = Seq("aa" -> -2L, "a" -> -3L, "b" -> -4L)
    val got = Unigram.segment(docs, vocab).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // "aa" -> one piece (-2); "bb" -> b|b (-8); 3 words, 6 chars, 4 pieces
    assert(got(1L) == ((3L, 6L, 4L, -12L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)), "NULL text must not vanish")
  }

  test("emRound: unused pieces pruned, UNK chars absorbed, scores sharpen toward used pieces") {
    val docs = Seq(
      (1L, "abab abab zq"),
      (2L, "abab cd")).toDF("doc_id", "text")
    // seed vocab: 'ab' wins every segmentation; 'ba' and 'abab' are
    // trained-in but never on a Viterbi path ('abab' scores worse than
    // ab+ab here); 'z','q' are NOT in the seed (UNK fallback)
    val v0 = Seq("ab" -> -2L, "ba" -> -9L, "abab" -> -9L,
      "a" -> -8L, "b" -> -8L, "c" -> -3L, "d" -> -3L)
    val v1 = Unigram.emRound(docs, v0, sampleDocs = 8).toMap
    assert(!v1.contains("ba") && !v1.contains("abab"),
      "pieces off every Viterbi path must be pruned")
    assert(v1.contains("z") && v1.contains("q"),
      "UNK-fallback characters must be absorbed with real scores")
    assert(v1.contains("ab") && v1("ab") >= -30L && v1("ab") <= 0L)
    // 'ab' is used 6x of 10 total pieces -> it outscores 'cd'-class
    // singles (1x each)
    assert(v1("ab") > v1("c"), "usage-dominant pieces must score higher")
    // the refined vocab still segments the corpus losslessly
    val (ps, _) = Unigram.segmentWord("ababzq", v1, 4)
    assert(ps.mkString == "ababzq")
  }

  test("fertilityReport: ppm ratios per source, zero-word sources keep NULL ratios") {
    val docs = Seq(
      (1L, "aa aa", "s1"),       // 2 words, 4 chars, 2 pieces under {aa}
      (2L, "aa", "s1"),
      (3L, "bb", "s2"),          // b|b: 2 pieces from 1 word
      (4L, "", "s3")).toDF("doc_id", "text", "source")
    val vocab = Seq("aa" -> -2L, "a" -> -3L, "b" -> -4L)
    val got = Unigram.fertilityReport(docs, vocab).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(got("s1") == ((3L, 6L, 3L, 1000000L)))
    assert(got("s2") == ((1L, 2L, 2L, 2000000L)), "b|b doubles fertility")
    assert(got("s3") == ((0L, 0L, 0L, -1L)), "no words -> NULL ratio, row kept")
  }

  test("byte-order tie-break matches binary collation on non-ASCII") {
    assert(Unigram.byteLt("a", "b"))
    assert(Unigram.byteLt("Z", "a"))    // 0x5A < 0x61
    assert(Unigram.byteLt("a", "é"))    // multi-byte UTF-8 sorts after ASCII
    assert(!Unigram.byteLt("é", "é"))
  }
}
