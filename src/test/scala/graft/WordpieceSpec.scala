package graft

import graft.ops.Wordpiece

class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  test("trainLocal: hand-computed likelihood-scored merge order") {
    // corpus "aaab aaab ab" -> words aaab x2 = (a,##a,##a,##b), ab x1 = (a,##b)
    // round 1 unit freqs: a:3, ##a:4, ##b:3
    //   pairs: (a,##a):2 -> 2/12, (##a,##a):2 -> 2/16, (##a,##b):2 -> 2/12,
    //          (a,##b):1 -> 1/9; tie 2/12 breaks to ("##a","##b") -> "##ab"
    // round 2: aaab=(a,##a,##ab); freqs a:3,##a:2,##ab:2,##b:1
    //   (a,##a):2 -> 1/3, (##a,##ab):2 -> 1/2, (a,##b):1 -> 1/3 -> "##aab"
    // round 3: aaab=(a,##aab); (a,##aab):2 -> 1/3 ties (a,##b):1 -> 1/3,
    //   smallest pair ("a","##aab") -> "aaab"
    val vocab = Wordpiece.trainLocal(Seq("aaab aaab ab"), nMerges = 3)
    assert(vocab == Vector("[UNK]", "##a", "##b", "a", "##ab", "##aab", "aaab"),
      vocab.toString)
    // training stops when no pairs remain (all single-char words)
    assert(Wordpiece.trainLocal(Seq("x y z"), 10) ==
      Vector("[UNK]", "x", "y", "z"))
  }

  test("encodeWord: greedy longest match, ## continuation, whole-word UNK") {
    val v = Set("[UNK]", "##a", "##b", "a", "##ab", "##aab", "aaab")
    assert(Wordpiece.encodeWord("aaab", v) == Vector("aaab"))
    assert(Wordpiece.encodeWord("ab", v) == Vector("a", "##b"))
    assert(Wordpiece.encodeWord("aab", v) == Vector("a", "##ab"))
    // 'b' never appears word-initial in the sample -> no bare-b token ->
    // the WHOLE word is UNK, not a partial encode
    assert(Wordpiece.encodeWord("ba", v) == Vector("[UNK]"))
    // over-long words are UNK without scanning (the HF guard)
    assert(Wordpiece.encodeWord("a" * 101, v) == Vector("[UNK]"))
    assert(Wordpiece.encodeWord("a" * 100, v).nonEmpty)
  }

  test("applyVocab: exact counts on known docs; invariants corpus-wide") {
    val docs = Seq(
      (1L, "aaab ab!"), // aaab->1, ab->2, "!" not in vocab -> UNK
      (2L, "ba aaab"),  // UNK + 1
      (3L, "")
    ).toDF("doc_id", "text")
    val vocab = Wordpiece.trainLocal(Seq("aaab aaab ab"), 3)
    val got = Wordpiece.applyVocab(docs, vocab)
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 7L, 4L, 1L, true, true)), got(1L).toString)
    assert(got(2L) == ((2L, 2L, 6L, 2L, 1L, true, true)), got(2L).toString)
    assert(got(3L) == ((3L, 0L, 0L, 0L, 0L, true, true)))
    // NULL text = zero counts, nothing vanishes, no NPE (the
    // Unigram.segment contract)
    val withNull = Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val nullRow = Wordpiece.applyVocab(withNull, vocab)
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)].head()
    assert(nullRow == ((9L, 0L, 0L, 0L, 0L, true, true)))
    // real corpus: deterministic vocabulary, invariants hold everywhere,
    // and 64 merges actually compress vs the char baseline on non-UNK text
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v1 = Wordpiece.trainVocab(real, nMerges = 64)
    assert(v1 == Wordpiece.trainVocab(real, nMerges = 64))
    assert(v1.size > 64, "alphabet + one token per merge")
    val applied = Wordpiece.applyVocab(real, v1)
    assert(applied.where(!$"lossless_ok" || !$"bounded_ok").isEmpty)
    val (units, toks, unks, words) = applied.agg(
      org.apache.spark.sql.functions.sum("n_units"),
      org.apache.spark.sql.functions.sum("n_tokens"),
      org.apache.spark.sql.functions.sum("n_unk"),
      org.apache.spark.sql.functions.sum("n_words"))
      .as[(Long, Long, Long, Long)].head()
    assert(toks < units, s"merges must compress: $toks tokens vs $units units")
    assert(unks < words / 10, s"UNK should be rare on in-distribution text: $unks/$words")
  }
}
