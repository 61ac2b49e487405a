package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sample-trained WordPiece tokenizer — completes the subword-trainer
  * family next to [[Bpe]] (frequency-scored merges) and [[Unigram]]
  * (likelihood-pruned vocabulary): WordPiece merges by the LIKELIHOOD
  * gain score freq(ab) / (freq(a)·freq(b)) (Schuster & Nakajima,
  * "Japanese and Korean voice search", ICASSP 2012; the formulation
  * popularized by BERT — Wu et al. 2016 §4.1 describe the LM-likelihood
  * criterion, of which this ratio is the unigram-LM special case), and
  * ENCODES by greedy longest-prefix match with the `##` continuation
  * convention and a whole-word `[UNK]` fallback — a different inference
  * rule from BPE's rank-ordered merge replay, which is why it earns its
  * own operator rather than a parameter on [[Bpe]].
  *
  * Training follows the bounded-sample discipline ([[Bpe.trainMerges]],
  * Similarity.fitCentroids): a deterministic md5-ordered sample, local
  * merge rounds, zero Spark jobs per round. Score ties break to the
  * lexicographically smallest pair; score comparison is EXACT — cross
  * multiplication in BigInt, no floating ratios — so the vocabulary is
  * deterministic cross-run at any sample size.
  *
  * Application is embarrassingly parallel: the vocabulary broadcasts,
  * each executor encodes words greedily with a per-partition Zipf memo.
  * Per-doc outputs carry the invariants greedy WordPiece must satisfy —
  * every non-UNK word reassembles exactly from its pieces with `##`
  * stripped (lossless), n_words <= n_tokens <= n_units + n_unk·maxWord —
  * as booleans the DuckDB oracle gates (q198), with exact token/UNK
  * counts pinned by WordpieceSpec on a hand-computed vocabulary. */
object Wordpiece {

  private val wordRe = TextAnalysis.bpePattern.r

  /** HuggingFace's max_input_chars_per_word guard: longer words are UNK
    * without scanning — bounds the O(len²) greedy matcher per word. */
  val maxWordChars = 100

  /** Split a word into initial WordPiece units: first char bare, every
    * later char with the `##` continuation prefix. */
  private[graft] def wordUnits(w: String): Vector[String] =
    w.headOption.map(_.toString).toVector ++
      w.drop(1).map(c => "##" + c)

  /** Local WordPiece training over an in-memory sample: per round, count
    * adjacent unit pairs and unit frequencies across the (word, freq)
    * table, merge the pair maximizing freq(ab)/(freq(a)·freq(b)), repeat.
    * Merging (a, ##b) yields "ab"; (##a, ##b) yields "##ab". Returns the
    * full vocabulary: [UNK], the sample alphabet (bare + ## forms), and
    * one token per merge, in training order. */
  private[graft] def trainLocal(texts: Seq[String], nMerges: Int): Vector[String] = {
    val words = mutable.Map.empty[Vector[String], Long]
    texts.foreach(t => wordRe.findAllIn(t).foreach { w =>
      if (w.length <= maxWordChars) {
        val u = wordUnits(w)
        words(u) = words.getOrElse(u, 0L) + 1L
      }
    })
    val vocab = Vector.newBuilder[String]
    vocab += "[UNK]"
    vocab ++= words.keysIterator.flatten.toVector.distinct.sorted
    var cur = words.toVector
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pc = mutable.Map.empty[(String, String), Long]
      val uc = mutable.Map.empty[String, Long]
      cur.foreach { case (units, c) =>
        units.foreach(u => uc(u) = uc.getOrElse(u, 0L) + c)
        var i = 0
        while (i + 1 < units.length) {
          val p = (units(i), units(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        // argmax of p/(a·b) by exact cross multiplication: p1·a2·b2 vs
        // p2·a1·b1 in BigInt (sample counts can reach 1e6; the triple
        // product would wrap int64). Ties -> lexicographically smallest.
        val best = pc.toVector.reduceLeft { (x, y) =>
          val lhs = BigInt(x._2) * uc(y._1._1) * uc(y._1._2)
          val rhs = BigInt(y._2) * uc(x._1._1) * uc(x._1._2)
          if (lhs > rhs || (lhs == rhs && implicitly[Ordering[(String, String)]]
            .lteq(x._1, y._1))) x else y
        }._1
        vocab += merged(best)
        cur = cur.map { case (units, c) => (mergeOnce(units, best), c) }
        round += 1
      }
    }
    vocab.result()
  }

  private[graft] def merged(p: (String, String)): String =
    p._1 + p._2.stripPrefix("##")

  private[graft] def mergeOnce(units: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < units.length) {
      if (i + 1 < units.length && units(i) == p._1 && units(i + 1) == p._2) {
        out += merged(p); i += 2
      } else { out += units(i); i += 1 }
    }
    out.result()
  }

  /** Train on a deterministic md5-ordered sample — bounded driver
    * traffic at any corpus size (the [[Bpe.trainMerges]] shape). */
  def trainVocab(documents: DataFrame, nMerges: Int, sampleDocs: Int = 256,
                 salt: String = "wordpiece"): Vector[String] = {
    val texts = documents
      .select(substring(col("text"), 1, Bpe.maxTrainChars).as("text"),
        md5(concat(col("doc_id").cast("string"), lit(salt))).as("_o"))
      .orderBy(col("_o"))
      .limit(sampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    trainLocal(texts, nMerges)
  }

  /** Greedy longest-match-first WordPiece encode of one word: take the
    * longest vocabulary prefix, emit it, continue on the `##`-prefixed
    * remainder; any position with NO matching prefix makes the whole
    * word `[UNK]` (the standard WordPiece contract — BERT's tokenizer
    * does exactly this, not a partial fallback). */
  private[graft] def encodeWord(word: String, vocab: Set[String]): Vector[String] = {
    if (word.length > maxWordChars) return Vector("[UNK]")
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      var end = word.length
      var hit: String = null
      while (end > start && hit == null) {
        val cand = prefix + word.substring(start, end)
        if (vocab.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Vector("[UNK]")
      out += hit
      start = end
    }
    out.result()
  }

  /** Apply a trained vocabulary corpus-wide. Output per doc: the
    * oracle-recomputable pre-token stats plus the WordPiece invariants
    * as booleans; exact `n_tokens` / `n_unk` stay available to callers
    * and specs. `lossless_ok`: every word is either `[UNK]` or
    * reassembles exactly with `##` stripped. `bounded_ok`:
    * n_words <= n_tokens and every non-UNK word's piece count is at
    * most its char count. */
  def applyVocab(documents: DataFrame, vocab: Seq[String]): DataFrame = {
    val spark = documents.sparkSession
    val vocabB = spark.sparkContext.broadcast(vocab.toSet)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_units", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_unk", LongType, nullable = false),
      StructField("lossless_ok", BooleanType, nullable = false),
      StructField("bounded_ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { it: Iterator[Row] =>
        val v = vocabB.value
        val memo = mutable.Map.empty[String, Vector[String]] // Zipf cache
        it.map { r =>
          val id = r.getLong(0)
          // NULL text = zero counts, nothing vanishes (the Unigram.segment
          // contract) — findAllIn(null) would NPE the whole job.
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          var nWords = 0L; var nUnits = 0L; var nTokens = 0L; var nUnk = 0L
          var lossless = true; var bounded = true
          wordRe.findAllIn(text).foreach { w =>
            val toks = memo.getOrElseUpdate(w, encodeWord(w, v))
            nWords += 1; nUnits += w.length; nTokens += toks.length
            val isUnk = toks == Vector("[UNK]")
            if (isUnk) nUnk += 1
            else {
              if (toks.map(_.stripPrefix("##")).mkString != w) lossless = false
              if (toks.length > w.length) bounded = false
            }
          }
          Row(id, nWords, nUnits, nTokens, nUnk,
            lossless, bounded && nWords <= nTokens)
        }
      }(enc)
  }
}
