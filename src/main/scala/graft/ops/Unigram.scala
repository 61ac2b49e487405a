package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model): the second real tokenizer family
  * next to [[Bpe]]. Where BPE greedily merges by pair frequency, the
  * unigram model scores every candidate piece with a log-probability
  * and segments each word by VITERBI — the maximum-likelihood split
  * under a piece vocabulary. Per word:
  *
  *   best(0) = 0
  *   best(i) = max over pieces p of length k ending at i:
  *               best(i - k) + score(p)
  *
  * Deviations from the paper, both deliberate and documented (the
  * [[Perplexity]] engine-exactness discipline):
  *
  *   - the vocabulary is the top-`vocabSize` substrings (length 1..
  *     `maxPieceLen`) of a bounded md5-ordered document sample by raw
  *     frequency — the paper's EM-driven vocabulary PRUNE replaced by
  *     frequency selection, because each EM round re-runs Viterbi over
  *     the sample with float posteriors no two engines reproduce
  *     bit-for-bit. Frequency selection keeps training a pure counting
  *     query a SQL oracle replays exactly (and follows the
  *     [[Bpe.trainMerges]] bounded-sample argument: piece statistics
  *     saturate on a few hundred documents);
  *   - piece scores are EXACT integer log-probs:
  *     `score(p) = ilog2((freq(p)·2^30) div total) − 30`
  *     — floor(log2) of the piece's sample probability, computed via
  *     binary-representation length (the [[Perplexity]] `ilog2`
  *     device, Spark `conv`/DuckDB `bin` both emit minimal binary),
  *     so a Viterbi total is a SUM OF LONGS, bit-identical across
  *     engines where float log-probs drift in the last ulp;
  *   - characters outside the vocabulary fall back to a fixed
  *     [[UnkScore]] = −40, strictly below every trainable score
  *     (scores are ≥ −30 by construction since every counted piece
  *     has probability ≥ 2^-30 on a bounded sample), so the UNK path
  *     never outbids a real piece — the paper's UNK handling;
  *   - Viterbi TIES are pinned: candidates compare by the integer key
  *     `cand·8 + k` (k = piece length ≤ 4 < 8), so equal totals
  *     resolve to the LONGER final piece, deterministically on both
  *     engines — the tie rule float implementations leave to
  *     accumulation order.
  *
  * The oracle (q188) replays BOTH halves in SQL: vocabulary training
  * as a substring-enumeration aggregation, and the Viterbi DP as a
  * recursive CTE whose state row carries the last `maxPieceLen`
  * (best, count) columns — advancing one character per recursion
  * step, exactly this object's loop.
  *
  * Shape at scale: training touches a `sampleDocs`-bounded sample
  * (one bounded driver collect, the [[Bpe.trainMerges]] shape); the
  * vocabulary (≤ `vocabSize` entries) broadcasts; segmentation is one
  * scan-side `mapPartitions` pass with the [[Bpe.applyMerges]]
  * Zipf word memo and NO shuffle — per-doc outputs aggregate in the
  * map task. Corpus cost: exactly one pass, embarrassingly parallel. */
object Unigram {

  /** Fallback score for single characters absent from the vocabulary —
    * strictly below the −30 floor of trainable scores. */
  val UnkScore = -40L

  private val Scale = 1L << 30
  private val wordRe = TextAnalysis.bpePattern.r

  /** floor(log2(x)) for x >= 1 — exact, the [[Perplexity]] device. */
  private def ilog2(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  /** Unsigned UTF-8 byte-lexicographic comparison — DuckDB's binary
    * VARCHAR collation, pinned explicitly so the top-V tie-break
    * (count desc, piece asc) selects the same boundary pieces as the
    * oracle's ORDER BY even on non-ASCII pieces (Scala's natural
    * String order is UTF-16 code units, which diverges from byte
    * order on supplementary characters). */
  private[graft] def byteLt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Train the piece vocabulary on a deterministic md5-ordered sample:
    * count every substring of length 1..`maxPieceLen` of every word
    * occurrence, keep the top `vocabSize` by (count desc, piece
    * byte-asc), score each by exact integer log2-probability. */
  def trainVocab(documents: DataFrame, vocabSize: Int = 512,
                 maxPieceLen: Int = 4, sampleDocs: Int = 256,
                 salt: String = "uni"): Seq[(String, Long)] = {
    require(maxPieceLen >= 1 && maxPieceLen <= 7,
      s"maxPieceLen must be in [1, 7] (the 8-way tie key), got $maxPieceLen")
    val texts = documents
      .select(substring(col("text"), 1, Bpe.maxTrainChars).as("text"),
        md5(concat(col("doc_id").cast("string"), lit(salt))).as("_o"))
      .orderBy(col("_o"))
      .limit(sampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    val counts = mutable.Map.empty[String, Long]
    texts.foreach(t => wordRe.findAllIn(t).foreach { w =>
      var i = 0
      while (i < w.length) {
        var k = 1
        while (k <= maxPieceLen && i + k <= w.length) {
          val p = w.substring(i, i + k)
          counts(p) = counts.getOrElse(p, 0L) + 1L
          k += 1
        }
        i += 1
      }
    })
    val total = counts.valuesIterator.sum
    require(total > 0, "empty sample: no substrings to train on")
    require(total < Scale,
      s"sample substring count $total >= 2^30 breaks the >= -30 score floor; shrink sampleDocs")
    counts.toVector
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else byteLt(pa, pb)
      }
      .take(vocabSize)
      .map { case (p, c) => p -> (ilog2(c * Scale / total) - 30L) }
  }

  /** Viterbi-segment one word under a score table: (pieces, total
    * score). The DP this runs is character-for-character the oracle's
    * recursive CTE; [[segment]] uses the (count, score) projection,
    * the spec asserts the pieces themselves. */
  private[graft] def segmentWord(word: String, vocab: Map[String, Long],
                               maxPieceLen: Int): (Vector[String], Long) = {
    val n = word.length
    if (n == 0) return (Vector.empty, 0L)
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1) // chosen final-piece length at i
    var i = 1
    while (i <= n) {
      var bestKey = Long.MinValue
      var k = 1
      val kMax = math.min(maxPieceLen, i)
      while (k <= kMax) {
        val piece = word.substring(i - k, i)
        val sc =
          if (k == 1) vocab.getOrElse(piece, UnkScore)
          else vocab.getOrElse(piece, Long.MinValue)
        if (sc != Long.MinValue) {
          val cand = best(i - k) + sc
          val key = cand * 8L + k
          if (key > bestKey) { bestKey = key; best(i) = cand; back(i) = k }
        }
        k += 1
      }
      i += 1
    }
    val pieces = Vector.newBuilder[String]
    var j = n
    var stack = List.empty[String]
    while (j > 0) { stack = word.substring(j - back(j), j) :: stack; j -= back(j) }
    stack.foreach(pieces += _)
    (pieces.result(), best(n))
  }

  /** Segment a corpus under a trained vocabulary. Per doc: word /
    * char / piece counts and the exact Viterbi log2-score sum — the
    * corpus-side statistics a tokenizer choice is evaluated on
    * (pieces-per-word compression, per-source score drift). One
    * scan-side pass, no shuffle; NULL text rows surface with zero
    * counts (the validate lesson: nothing vanishes). */
  /** `scriptAware = true` switches the WORD definition from the q34
    * pre-token regex to [[TextAnalysis.segmentScriptsLocal]]-spaced
    * whitespace tokens — no-space-script (CJK/Thai) runs become char
    * BIGRAMS instead of whatever the regex makes of them, so fertility
    * denominators read linguistically plausible word units (the q257
    * contract). Default false: byte-for-byte the historical behavior. */
  def segment(documents: DataFrame, vocab: Seq[(String, Long)],
              maxPieceLen: Int = 4, scriptAware: Boolean = false): DataFrame = {
    val spark = documents.sparkSession
    val vocabB = spark.sparkContext.broadcast(vocab.toMap)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("score_fx", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    documents.select(col("doc_id").cast("long"), col("text"))
      .mapPartitions { it: Iterator[Row] =>
        val v = vocabB.value
        val memo = mutable.Map.empty[String, (Int, Long)] // Zipf cache
        it.map { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) null else r.getString(1)
          var nWords = 0L; var nChars = 0L; var nPieces = 0L; var score = 0L
          val words: Iterator[String] =
            if (text == null) Iterator.empty
            else if (scriptAware)
              TextAnalysis.segmentScriptsLocal(text)
                .split("\\s+").iterator.filter(_.nonEmpty)
            else wordRe.findAllIn(text)
          words.foreach { w =>
            val (np, sc) = memo.getOrElseUpdate(w, {
              val (ps, s) = segmentWord(w, v, maxPieceLen)
              (ps.length, s)
            })
            nWords += 1; nChars += w.length; nPieces += np; score += sc
          }
          Row(id, nWords, nChars, nPieces, score)
        }
      }(enc)
  }

  /** One HARD-EM (Viterbi-EM) refinement round — the deterministic core
    * of the paper's EM vocabulary optimization (Kudo '18 §3.2 trains
    * piece probabilities by EM; the hard-EM variant replaces expected
    * counts with Viterbi-path counts, which makes the round exactly
    * replayable in integers where soft-EM's float posteriors are not):
    *
    *   1. Viterbi-segment every word of the SAME md5-ordered sample
    *      under the current vocabulary (occurrence-weighted);
    *   2. count how often each piece is actually USED on the chosen
    *      paths — single-char UNK fallbacks count too, so characters
    *      the seed vocabulary missed get absorbed with real scores
    *      (the paper's always-kept character inventory);
    *   3. PRUNE pieces the Viterbi paths never use (the EM prune: a
    *      piece that loses every segmentation contest carries no
    *      probability mass), cap at `vocabSize` by the same
    *      (count desc, piece byte-asc) rule, and re-score by exact
    *      integer log2 of usage probability.
    *
    * The returned vocabulary drops dead weight and sharpens scores
    * toward pieces that win segmentations — one round is the
    * documented deviation (fixed-point iteration to convergence adds
    * rounds of the same shape; each is oracle-replayable the same
    * way). Training stays a bounded driver computation on the sample
    * (the [[trainVocab]] shape); the q196 oracle replays the round in
    * SQL — the sample segmentation's CHOSEN PIECES come out of the
    * recursive-CTE DP by carrying the path string per state. */
  def emRound(documents: DataFrame, vocab: Seq[(String, Long)],
              vocabSize: Int = 512, maxPieceLen: Int = 4,
              sampleDocs: Int = 256, salt: String = "uni"): Seq[(String, Long)] = {
    val texts = documents
      .select(substring(col("text"), 1, Bpe.maxTrainChars).as("text"),
        md5(concat(col("doc_id").cast("string"), lit(salt))).as("_o"))
      .orderBy(col("_o"))
      .limit(sampleDocs)
      .select("text").collect().map(_.getString(0)).toSeq
    val v0 = vocab.toMap
    val used = mutable.Map.empty[String, Long]
    val memo = mutable.Map.empty[String, Vector[String]]
    texts.foreach(t => wordRe.findAllIn(t).foreach { w =>
      memo.getOrElseUpdate(w, segmentWord(w, v0, maxPieceLen)._1)
        .foreach(p => used(p) = used.getOrElse(p, 0L) + 1L)
    })
    val total = used.valuesIterator.sum
    require(total > 0, "empty sample: no pieces used")
    require(total < Scale,
      s"sample piece-usage count $total >= 2^30 breaks the score floor")
    used.toVector
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else byteLt(pa, pb)
      }
      .take(vocabSize)
      .map { case (p, c) => p -> (ilog2(c * Scale / total) - 30L) }
  }

  /** Per-source tokenizer FERTILITY report — the audit run before a
    * tokenizer choice ships (fertility = pieces per word, the standard
    * cross-lingual tokenizer-quality metric; a source whose fertility
    * runs hot is under-served by the vocabulary and pays its context
    * budget in fragments): [[segment]]'s per-doc counts rolled up by
    * source with exact ppm ratios. `1e6·pieces` routes through
    * decimal(38,0) (the [[graft.ops.Quality.cohenKappa]] overflow
    * discipline — per-source piece counts pass 9·10^12 on real
    * corpora); sources with zero words report NULL ratios (the
    * no-evidence rule). Shape at scale: the [[segment]] scan plus one
    * map-side-combined groupBy on source — the report frame is bounded
    * by the source alphabet. */
  def fertilityReport(documents: DataFrame, vocab: Seq[(String, Long)],
                      sourceCol: String = "source",
                      maxPieceLen: Int = 4,
                      scriptAware: Boolean = false): DataFrame =
    segment(documents, vocab, maxPieceLen, scriptAware)
      .join(documents.select(col("doc_id"), col(sourceCol)), Seq("doc_id"))
      .groupBy(col(sourceCol))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_pieces")).as("n_pieces"))
      .select(col(sourceCol), col("n_words"), col("n_chars"), col("n_pieces"),
        when(col("n_words") > 0L, expr(
          "cast((1000000 * cast(n_pieces as decimal(38,0))) div n_words as bigint)"))
          .as("pieces_per_word_ppm"),
        when(col("n_chars") > 0L, expr(
          "cast((1000000 * cast(n_pieces as decimal(38,0))) div n_chars as bigint)"))
          .as("pieces_per_char_ppm"))
}
