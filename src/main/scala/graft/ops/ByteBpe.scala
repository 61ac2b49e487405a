package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-level BPE — the fourth tokenizer family ([[Bpe]] char-level,
  * [[Unigram]], [[Wordpiece]]) and the one real LLM pipelines ship
  * (GPT-2/RoBERTa-style): pre-tokens decompose to UTF-8 BYTES, each
  * byte maps through a fixed 256-char bijection into printable-ish
  * unicode, and merges operate over mapped bytes. Consequences the
  * other three families cannot offer:
  *
  *  - encode is TOTAL: every byte has a unit, so there is NO UNK —
  *    any string (any language, mojibake, binary-ish garbage) encodes;
  *  - decode is EXACT: the byte map is a bijection, so
  *    `unmapTokens(encode(w)) == w` for every string (the lossless
  *    property [[applyMerges]] certifies corpus-wide);
  *  - merges can cross the bytes of one multi-byte char (a `Ã©`
  *    merge makes `é` a single token) — subword granularity below
  *    the codepoint, which is how byte-level vocabularies stay small.
  *
  * Training/application discipline is [[Bpe]]'s: bounded md5-ordered
  * sample on the driver (chars capped at collect time), merge table
  * broadcast, embarrassingly-parallel encode with a per-partition
  * Zipf memo. The merge LOOP is shared ([[Bpe.trainFromWords]]) —
  * only the unitizer differs (mapped bytes vs chars).
  *
  * Cross-engine contract: the q255 oracle replays the byte map (a
  * 256-row VALUES table), the UTF-8 decomposition (arithmetic on
  * codepoints), and the merge loop (the q184 recursive-CTE device)
  * in DuckDB. BMP text only on the ORACLE side — DuckDB iterates
  * codepoints while the JVM iterates UTF-16 units, so astral chars
  * sit outside the oracle contract (the TextAnalysis line-2862 rule);
  * the Scala encode/decode itself is astral-safe (`getBytes` works on
  * surrogate pairs) and the spec pins that directly. */
object ByteBpe {

  /** GPT-2 `bytes_to_unicode`: bytes that are "printable" (33-126,
    * 161-172, 174-255) map to their own codepoint; the other 68 map to
    * 256+k in byte order. A bijection by construction. */
  val byteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var k = 0
    for (b <- 0 until 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + k).toChar; k += 1 }
    }
    out
  }

  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Pre-tokenize exactly like [[Bpe]] (q34's proven regex) — the
    * byte map applies WITHIN pre-tokens, after splitting. */
  private val wordRe = TextAnalysis.bpePattern.r

  /** One pre-token's UTF-8 bytes as mapped chars (the merge units). */
  def mapWord(w: String): String = {
    val bytes = w.getBytes("UTF-8")
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Exact inverse: mapped tokens back to the original string. */
  def unmapTokens(toks: Seq[String]): String = {
    val bo = new java.io.ByteArrayOutputStream()
    toks.foreach(_.foreach(c => bo.write(charToByte(c))))
    new String(bo.toByteArray, "UTF-8")
  }

  private[graft] def trainLocal(texts: Seq[String],
                                nMerges: Int): Seq[(String, String)] = {
    val words = mutable.Map.empty[Vector[String], Long]
    texts.foreach(t => wordRe.findAllIn(t).foreach { w =>
      val u = mapWord(w).map(_.toString).toVector
      words(u) = words.getOrElse(u, 0L) + 1L
    })
    Bpe.trainFromWords(words.toVector, nMerges)
  }

  /** Train on the [[Bpe.trainMerges]] bounded sample (same md5 order,
    * same collect-time char cap). */
  def trainMerges(documents: DataFrame, nMerges: Int, sampleDocs: Int = 256,
                  salt: String = "bbpe"): Seq[(String, String)] = {
    val texts = documents
      .select(substring(col("text"), 1, Bpe.maxTrainChars).as("text"),
        md5(concat(col("doc_id").cast("string"), lit(salt))).as("_o"))
      .orderBy(col("_o"))
      .limit(sampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    trainLocal(texts, nMerges)
  }

  /** Encode one pre-token: map to bytes, then the standard
    * lowest-rank-first merge loop. Total — never fails, never UNKs. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] =
    Bpe.encodeWord(mapWord(word), rank)

  /** Corpus-wide application: per doc, pre-token/byte/token counts
    * plus the byte-level invariants as oracle-gated booleans —
    * `roundtrip_ok` (decode of every word's tokens reassembles the
    * word EXACTLY, the lossless property) and `bounded_ok`
    * (n_words <= n_tokens <= n_bytes). Same mapPartitions + Zipf-memo
    * shape as [[Bpe.applyMerges]]; bodies never shuffle. */
  def applyMerges(documents: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = documents.sparkSession
    val rankB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("roundtrip_ok", BooleanType, nullable = false),
      StructField("bounded_ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { it: Iterator[Row] =>
        val rank = rankB.value
        val memo = mutable.Map.empty[String, Vector[String]] // Zipf cache
        it.map { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          var nWords = 0L; var nBytes = 0L; var nTokens = 0L
          var roundtrip = true
          wordRe.findAllIn(text).foreach { w =>
            val toks = memo.getOrElseUpdate(w, encodeWord(w, rank))
            nWords += 1
            nBytes += toks.iterator.map(_.length.toLong).sum
            nTokens += toks.length
            if (unmapTokens(toks) != w) roundtrip = false
          }
          Row(id, nWords, nBytes, nTokens, roundtrip,
            nWords <= nTokens && nTokens <= nBytes)
        }
      }(enc)
  }
}
