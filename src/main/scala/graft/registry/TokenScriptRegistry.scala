package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{ByteBpe, Curate, TextAnalysis, Unigram}

/** Tokenizer/script domain registry: byte-level BPE (q255) and the
  * no-space-script segmentation family (q254/q256/q257), each query
  * next to its DuckDB oracle — the per-domain layout the round-14
  * verdict asked the monolithic SparkEntry maps to migrate toward.
  * Unigram training/DP oracle CTEs stay in SparkEntry (shared with
  * q188/q192/q196) and are referenced `private[graft]`-qualified. */
private[graft] object TokenScriptRegistry {
  import OracleSql.{q => sqlQ}

  // ------------------------------------------------------------ fixtures

  /** 64 consecutive Han chars (U+4E00..U+4E3F) — the planted CJK
    * alphabet shared by the byte-BPE and script-segmentation fixtures.
    * Generated, not typed, so both engines index the SAME codepoints
    * (the DuckDB oracles embed this exact literal). */
  private[graft] val han64: String = (0x4E00 until 0x4E40).map(_.toChar).mkString

  /** 32 Katakana chars (U+30A2..U+30C1) — the kana leg of the planted
    * no-space-script fixture. */
  private[graft] val kana32: String = (0x30A2 until 0x30C2).map(_.toChar).mkString

  private def hanAt(ix: Column): Column =
    lit(han64).substr((ix + 1).cast("int"), lit(1))

  private def kanaAt(ix: Column): Column =
    lit(kana32).substr((ix + 1).cast("int"), lit(1))

  /** q255 fixture: every 7th doc's text goes multi-byte (accented
    * Latin + three [[han64]] Han chars) so byte-level merges cross
    * codepoint boundaries; other docs keep their ASCII word-soup.
    * BMP-only by construction — the oracle contract (DuckDB iterates
    * codepoints, the JVM iterates UTF-16 units; astral chars diverge). */
  private def byteDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(lit("héllo wörld thé "),
          hanAt(pmod(col("doc_id"), lit(64))),
          hanAt(pmod(col("doc_id") * 3, lit(64))),
          hanAt(pmod(col("doc_id") * 5, lit(64)))))
        .otherwise(col("text")).as("text"))

  /** q254/q256/q257 fixture: every 3rd doc becomes a pure Han run
    * (20 + doc_id%5 chars, NO spaces — the text whitespace tokens read
    * as ONE token), every 3k+1 doc mixes Latin words with a 6-char
    * Katakana run, the rest keep their ASCII word-soup. Both engines
    * synthesize the same codepoints from [[han64]]/[[kana32]]. */
  private def cjkDocs(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val hanRun = array_join(transform(
      sequence(lit(0), lit(19) + pmod(d, lit(5))),
      i => hanAt(pmod(d * 7 + i * 13, lit(64)))), "")
    val kanaRun = array_join(transform(sequence(lit(0), lit(5)),
      i => kanaAt(pmod(d * 11 + i * 5, lit(32)))), "")
    docs.select(d, col("source"),
      when(d % 3 === 0, hanRun)
        .when(d % 3 === 1, concat(lit("mix "), kanaRun, lit(" tail")))
        .otherwise(col("text")).as("text"))
  }

  /** Fixed byte-level merge table (the SparkEntry.subwordMerges
    * discipline: the oracle must hold the same literal; trained-table
    * composition is ByteBpeSpec's job). ASCII pairs reuse the q184
    * English merges (printable bytes self-map, so they read the same);
    * the last three cross MULTI-BYTE char boundaries — Ã© / Ã¶ are the
    * mapped UTF-8 byte pairs of é / ö, ä¸ the lead byte pair of the
    * U+4E00..U+4E3F Han block. */
  private val byteMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "in" -> "g",
    "Ã" -> "©", "Ã" -> "¶", "ä" -> "¸")

  // ------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // byte-level BPE (ByteBpe.applyMerges, the GPT-2 family): UTF-8
    // byte decomposition + the 256-char bijection + merges that cross
    // codepoint boundaries, exact token counts replayed by the oracle's
    // recursive merge CTE over the byte-mapped word set; roundtrip_ok
    // certifies losslessness corpus-wide (encode is TOTAL — no UNK)
    "q255_byte_bpe" -> ((s, d) =>
      ByteBpe.applyMerges(byteDocs(Tables.documents(s, d)), byteMerges)),
    // no-space-script segmentation (TextAnalysis.tokensSegmented): the
    // planted Han docs read as ONE whitespace token but n/2-ish char
    // bigrams under the script-aware fallback — both counts plus the
    // script evidence in one scan-side pass, oracle-replayed
    "q254_cjk_segment" -> ((s, d) =>
      cjkDocs(Tables.documents(s, d)).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.tokenCountSegmented(col("text")).cast("long")
          .as("n_seg_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"),
          TextAnalysis.noSpaceScriptClass, ""))).cast("long")
          .as("n_ns_chars"))),
    // token-budget sampling DENOMINATED in script-aware tokens (the
    // q119 two-level prefix-sum with tokensSegmented as the cost): a
    // CJK doc now pays its real token cost instead of reading as ~1
    "q256_cjk_budget" -> ((s, d) =>
      Curate.budgetPerGroup(
        cjkDocs(Tables.documents(s, d)).select(col("doc_id"), col("source"),
          TextAnalysis.tokenCountSegmented(col("text")).cast("long")
            .as("n_toks")),
        groupCol = "source", idCol = "doc_id", costCol = "n_toks",
        budget = 200L, salt = "cjk")),
    // tokenizer fertility with the scriptAware word definition
    // (Unigram.fertilityReport): words = segmentScripts-spaced
    // whitespace tokens, so Han runs contribute char bigrams as word
    // units and pieces/word reads linguistically plausible; the oracle
    // replays training (q188 CTEs over the planted corpus), the
    // Viterbi DP, and the segmented word stream
    "q257_cjk_fertility" -> ((s, d) => {
      val docs = cjkDocs(Tables.documents(s, d))
      Unigram.fertilityReport(docs, Unigram.trainVocab(docs),
        scriptAware = true)
    }))

  // ------------------------------------------------------------ oracles

  /** The [[ByteBpe.byteToChar]] bijection as a 256-row VALUES table —
    * every mapped char is either printable ASCII/Latin-1 (quote-doubled
    * where needed) or >= U+0100, so the literals are safe in standard
    * SQL strings. */
  private val byteMapValuesSql: String =
    (0 until 256).map(b =>
      "(" + b + ", " + sqlQ(ByteBpe.byteToChar(b).toString) + ")")
      .mkString(", ")

  private val byteMergesValuesSql: String =
    byteMerges.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${sqlQ(a)}, ${sqlQ(b)})" }
      .mkString(", ")

  /** The q255 byteDocs fixture as SQL (same [[han64]] literal). */
  private def byteDocsCteSql: String =
    "bdocs AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 " +
      "THEN 'héllo wörld thé ' " +
      "|| substr(" + sqlQ(han64) + ", CAST(doc_id % 64 AS INT) + 1, 1) " +
      "|| substr(" + sqlQ(han64) + ", CAST((doc_id * 3) % 64 AS INT) + 1, 1) " +
      "|| substr(" + sqlQ(han64) + ", CAST((doc_id * 5) % 64 AS INT) + 1, 1) " +
      "ELSE text END AS text FROM documents)"

  /** DuckDB twin of [[TextAnalysis.segmentScripts]]: the same three
    * global replaces, same order, \1-style backrefs. */
  private def segSql(e: String): String =
    TextAnalysis.segmentPasses.foldLeft(e) { case (u, (pat, _, rep)) =>
      s"regexp_replace($u, ${sqlQ(pat)}, ${sqlQ(rep)}, 'g')" }

  /** Segmented whitespace-token count (the tokensSegmented twin). */
  private def segTokSql(e: String): String =
    "LEN(list_filter(regexp_split_to_array(" + segSql(e) +
      ", '\\s+'), x -> x <> ''))"

  /** The q254/q256/q257 cjkDocs fixture as SQL (same [[han64]] /
    * [[kana32]] literals, same index arithmetic). */
  private def cjkDocsCteSql: String =
    "cjkd AS (SELECT doc_id, source, CASE " +
      "WHEN doc_id % 3 = 0 THEN array_to_string(list_transform(" +
      "range(20 + doc_id % 5), i -> substr(" + sqlQ(han64) +
      ", CAST((doc_id * 7 + i * 13) % 64 AS INT) + 1, 1)), '') " +
      "WHEN doc_id % 3 = 1 THEN 'mix ' || array_to_string(list_transform(" +
      "range(6), i -> substr(" + sqlQ(kana32) +
      ", CAST((doc_id * 11 + i * 5) % 32 AS INT) + 1, 1)), '') || ' tail' " +
      "ELSE text END AS text FROM documents)"

  val oracleSql: Map[String, String] = Map(
    // byte-BPE replay: the byteDocs fixture, the 256-row byte map, the
    // arithmetic UTF-8 decomposition of each distinct pre-token, and
    // the q184 recursive merge-loop device over the MAPPED word —
    // exact token/byte counts inside the hash gate; the invariant
    // flags read TRUE like q97's
    "q255_byte_bpe" ->
      ("WITH RECURSIVE " + byteDocsCteSql + ",\n" +
        "mg(rk, a, b) AS (VALUES " + byteMergesValuesSql + "),\n" +
        "bmap(b, c) AS (VALUES " + byteMapValuesSql + "),\n" +
        """wset AS (SELECT DISTINCT unnest(regexp_extract_all(text,
          |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) w FROM bdocs),
          |chs AS (SELECT w, unnest(range(1, length(w) + 1)) i FROM wset),
          |cps AS (SELECT w, i, unicode(substr(w, CAST(i AS INT), 1)) cp FROM chs),
          |bsq AS (SELECT w, i,
          |    CASE WHEN cp < 128 THEN cp
          |         WHEN cp < 2048 THEN 192 + cp // 64
          |         WHEN cp < 65536 THEN 224 + cp // 4096
          |         ELSE 240 + cp // 262144 END b1,
          |    CASE WHEN cp < 128 THEN NULL
          |         WHEN cp < 2048 THEN 128 + cp % 64
          |         WHEN cp < 65536 THEN 128 + (cp // 64) % 64
          |         ELSE 128 + (cp // 4096) % 64 END b2,
          |    CASE WHEN cp < 2048 THEN NULL
          |         WHEN cp < 65536 THEN 128 + cp % 64
          |         ELSE 128 + (cp // 64) % 64 END b3,
          |    CASE WHEN cp < 65536 THEN NULL ELSE 128 + cp % 64 END b4
          |  FROM cps),
          |cmp AS (SELECT w, i, m1.c || COALESCE(m2.c, '') || COALESCE(m3.c, '')
          |      || COALESCE(m4.c, '') s
          |  FROM bsq LEFT JOIN bmap m1 ON m1.b = bsq.b1
          |    LEFT JOIN bmap m2 ON m2.b = bsq.b2
          |    LEFT JOIN bmap m3 ON m3.b = bsq.b3
          |    LEFT JOIN bmap m4 ON m4.b = bsq.b4),
          |mwd AS (SELECT w, string_agg(s, '' ORDER BY i) mw FROM cmp GROUP BY w),
          |enc AS (
          |  SELECT w, 'Ϩ' || regexp_replace(mw, '(.)', '\1Ϩ', 'g') st FROM mwd
          |  UNION ALL
          |  SELECT e.w, replace(e.st, 'Ϩ' || m.a || 'Ϩ' || m.b || 'Ϩ',
          |      'Ϩ' || m.a || m.b || 'Ϩ')
          |  FROM (SELECT w, st, (SELECT min(rk) FROM mg
          |          WHERE contains(st, 'Ϩ' || a || 'Ϩ' || b || 'Ϩ')) mr
          |        FROM enc) e
          |  JOIN mg m ON m.rk = e.mr),
          |wc AS (SELECT w,
          |    CAST(length(st) - length(replace(st, 'Ϩ', '')) - 1 AS BIGINT) nt,
          |    CAST(length(replace(st, 'Ϩ', '')) AS BIGINT) nb
          |  FROM enc WHERE NOT EXISTS (SELECT 1 FROM mg
          |    WHERE contains(st, 'Ϩ' || a || 'Ϩ' || b || 'Ϩ'))),
          |dw AS (SELECT doc_id, unnest(regexp_extract_all(text,
          |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) w FROM bdocs),
          |agg AS (SELECT doc_id, COUNT(*) nw, SUM(nb) nby, SUM(nt) ntk
          |  FROM dw JOIN wc USING (w) GROUP BY 1)
          |SELECT d.doc_id, CAST(COALESCE(nw, 0) AS BIGINT) n_words,
          |  CAST(COALESCE(nby, 0) AS BIGINT) n_bytes,
          |  CAST(COALESCE(ntk, 0) AS BIGINT) n_tokens,
          |  TRUE roundtrip_ok, TRUE bounded_ok
          |FROM bdocs d LEFT JOIN agg USING (doc_id)""".stripMargin),
    // script-segmentation replay: planted cjk fixture, whitespace vs
    // segmented token counts, no-space-script char evidence
    "q254_cjk_segment" ->
      ("WITH " + cjkDocsCteSql + """
        |SELECT doc_id,
        |  CAST(LEN(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> x <> '')) AS BIGINT) n_ws_tokens,
        |  CAST(""".stripMargin + segTokSql("text") + """ AS BIGINT) n_seg_tokens,
        |  CAST(length(text) - length(regexp_replace(text, """.stripMargin +
        sqlQ(TextAnalysis.noSpaceScriptClass) + """, '', 'g')) AS BIGINT)
        |    n_ns_chars
        |FROM cjkd""".stripMargin),
    // the q119 window replay with the segmented-token cost
    "q256_cjk_budget" ->
      ("WITH " + cjkDocsCteSql + """,
        |t AS (SELECT doc_id, source,
        |  CAST(""".stripMargin + segTokSql("text") + """ AS BIGINT) n_toks
        |  FROM cjkd)
        |SELECT doc_id, source, n_toks, cum FROM (
        |  SELECT doc_id, source, n_toks,
        |    CAST(SUM(n_toks) OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'cjk'), 1, 8), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
        |  FROM t WHERE n_toks > 0)
        |WHERE cum <= 200""".stripMargin),
    // fertility replay under the scriptAware word definition: q188
    // training over the PLANTED corpus (FROM documents -> FROM cjkd),
    // the q192 Viterbi DP, and a SEGMENTED whitespace word stream
    "q257_cjk_fertility" ->
      ("WITH RECURSIVE " + cjkDocsCteSql + ",\n" +
        graft.SparkEntry.unigramTrainCte
          .replace("FROM documents", "FROM cjkd") + ",\n" +
        """dw AS MATERIALIZED (SELECT doc_id, w, COUNT(*) m
          |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
          |      """.stripMargin + segSql("text") + """, '\s+'),
          |      x -> x <> '')) w FROM cjkd)
          |  GROUP BY 1, 2),
          |uw AS MATERIALIZED (SELECT DISTINCT w FROM dw),
          |""".stripMargin +
        graft.SparkEntry.unigramDpCte("vt", "voc", "uw", paths = false) + """,
        |fin AS MATERIALIZED (SELECT w, b1 score, n1 np FROM vt
        |  WHERE pos = length(w)),
        |agg AS (SELECT doc_id, SUM(m) nw, SUM(m * length(w)) nc,
        |    SUM(m * np) npc
        |  FROM dw JOIN fin USING (w) GROUP BY 1),
        |j AS (SELECT d.source, COALESCE(nw, 0) nw, COALESCE(nc, 0) nc,
        |    COALESCE(npc, 0) npc
        |  FROM cjkd d LEFT JOIN agg USING (doc_id))
        |SELECT source, CAST(SUM(nw) AS BIGINT) n_words,
        |  CAST(SUM(nc) AS BIGINT) n_chars,
        |  CAST(SUM(npc) AS BIGINT) n_pieces,
        |  CASE WHEN SUM(nw) > 0 THEN
        |    CAST((1000000 * SUM(npc)) // SUM(nw) AS BIGINT) END
        |    pieces_per_word_ppm,
        |  CASE WHEN SUM(nc) > 0 THEN
        |    CAST((1000000 * SUM(npc)) // SUM(nc) AS BIGINT) END
        |    pieces_per_char_ppm
        |FROM j GROUP BY 1""".stripMargin))
}
