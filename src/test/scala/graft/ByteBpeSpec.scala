package graft

import graft.ops.ByteBpe

/** Byte-level BPE: the byte<->char bijection, totality (no UNK — any
  * string encodes), exact lossless decode (incl. astral chars, which
  * sit OUTSIDE the SQL-oracle contract but inside the Scala one),
  * deterministic training, merges across multi-byte codepoints, and
  * hand-computed corpus counts for applyMerges.
  */
class ByteBpeSpec extends SparkTestBase {
  import spark.implicits._

  test("byteToChar is a bijection; printable bytes self-map") {
    assert(ByteBpe.byteToChar.distinct.length == 256)
    assert(ByteBpe.charToByte.size == 256)
    ((33 to 126) ++ (161 to 172) ++ (174 to 255)).foreach(b =>
      assert(ByteBpe.byteToChar(b) == b.toChar, s"byte $b must self-map"))
    (0 to 32).foreach(b => assert(ByteBpe.byteToChar(b) >= 256.toChar))
    (0 until 256).foreach(b =>
      assert(ByteBpe.charToByte(ByteBpe.byteToChar(b)) == b))
  }

  test("mapWord: hand-computed multi-byte decompositions") {
    assert(ByteBpe.mapWord("the") == "the") // ASCII letters self-map
    assert(ByteBpe.mapWord("é") == "Ã©")    // C3 A9
    assert(ByteBpe.mapWord("ö") == "Ã¶")    // C3 B6
    assert(ByteBpe.mapWord("一") == "ä¸" + ByteBpe.byteToChar(0x80)) // E4 B8 80
    // astral: 4 UTF-8 bytes, Scala-side only (oracle contract is BMP)
    assert(ByteBpe.mapWord("😀").length == 4) // U+1F600
  }

  test("encode is total and decode is exact — property battery") {
    val merges = ByteBpe.trainLocal(Seq("the thé rain in spain 一丁 héllo"), 24)
    val rank = merges.zipWithIndex.toMap
    val rng = new scala.util.Random(42)
    // pieces, not chars: indexing by UTF-16 unit would split the 😀
    // surrogate pair into lone surrogates — not valid strings, and
    // rightly un-encodable in UTF-8
    val pieces = Vector("a", "b", "c", "T", "the", "é", "ö", "一", "丁",
      ",", ".", "9", "ÿ", "ā", "丿", "😀", " ")
    (1 to 200).foreach { _ =>
      val s = (1 to (1 + rng.nextInt(12)))
        .map(_ => pieces(rng.nextInt(pieces.length))).mkString
      val toks = ByteBpe.encodeWord(s, rank)
      assert(toks.nonEmpty || s.isEmpty)
      assert(ByteBpe.unmapTokens(toks) == s, s"round trip failed for <$s>")
      assert(toks.map(_.length).sum == s.getBytes("UTF-8").length,
        "token bytes must partition the word's bytes")
    }
  }

  test("trainLocal: deterministic first merge and tie-break") {
    // 'aa' x3: pair (a,a) dominates and merges first
    val m = ByteBpe.trainLocal(Seq("aa aa aa b"), 2)
    assert(m.head == ("a" -> "a"))
    // all pairs tie at 1 -> lexicographically smallest pair first
    val t = ByteBpe.trainLocal(Seq("xy wv"), 1)
    assert(t == Seq("w" -> "v"))
  }

  test("applyMerges: hand-computed counts, multi-byte merges, invariants") {
    // merges: t+h, th+e (ASCII), Ã+© (the two bytes of é)
    val merges = Seq("t" -> "h", "th" -> "e", "Ã" -> "©")
    val docs = Seq(
      (1L, "the é"),     // 'the'->1 tok 3 bytes; 'é'->1 tok 2 bytes
      (2L, "thé"),       // pre-tokens 'th' (1 tok), 'é' (1 tok)
      (3L, "一"),        // 3 bytes, no merge for byte 3 -> 3 tokens
      (4L, ""))
      .toDF("doc_id", "text")
    val got = ByteBpe.applyMerges(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got(1L) == ((2L, 5L, 2L, true, true)))
    assert(got(2L) == ((2L, 4L, 2L, true, true)))
    assert(got(3L) == ((1L, 3L, 3L, true, true)))
    assert(got(4L) == ((0L, 0L, 0L, true, true)))
  }

  test("trainMerges + applyMerges round trip on a corpus sample") {
    val docs = (0L until 64L).map(i =>
      (i, s"the quick bröwn fox $i jumps 一丁 over thé lazy dög"))
      .toDF("doc_id", "text")
    val merges = ByteBpe.trainMerges(docs, nMerges = 32, sampleDocs = 16)
    assert(merges.nonEmpty && merges.size <= 32)
    val out = ByteBpe.applyMerges(docs, merges).collect()
    assert(out.forall(_.getBoolean(4)), "lossless corpus-wide")
    assert(out.forall(_.getBoolean(5)), "n_words <= n_tokens <= n_bytes")
    // merges must actually compress: tokens strictly below bytes
    assert(out.forall(r => r.getLong(3) < r.getLong(2)))
  }
}
