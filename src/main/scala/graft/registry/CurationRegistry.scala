package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Boilerplate, Curate, LangId, Quality, Stats, TextAnalysis}
import graft.SparkEntry.{blocklistFixture, blocklistOracleSql,
  blocklistPhrases, boilerplateCtes, emailPat, phonePat, toks}

/** Text-curation domain registry: the per-document cleaning and
  * shaping operators — language id (q23/q23b), fingerprinting (q24),
  * normalization and HTML stripping (q106/q107), chunking
  * (q47/q128), PII redaction (q48), the composed curate gate (q50),
  * length banding and batching (q81/q177), chunk dedup (q75), span
  * corruption (q127/q183), Aho-Corasick blocklists (q176b), jusText
  * boilerplate blocks (q137), string ANALYZE stats (q72), and the
  * corpus datasheet (q195). Mechanical move out of SparkEntry
  * (registry-split tranche 15): queries and SQL moved verbatim; the
  * oracle gate re-ran on the split — byte-identical results. */
private[graft] object CurationRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_lang_id" -> ((s, d) =>
      TextAnalysis.langId(Tables.documents(s, d))),
    "q24_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprints(Tables.documents(s, d))),
    // Unicode + whitespace normalization: the oracle splices a decomposed
    // accent, tab/space runs, and a BEL control into every doc (both
    // engines, identically), then each normalizes with its own machinery
    // — NormalizeText here, nfc_normalize + regex + trim in DuckDB
    "q106_normalize" -> ((s, d) =>
      Curate.normalizeText(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" caf"), lit("e\u0301"),
            lit("  x\ty"), lit("\u0007")).as("text")))),
    // HTML strip over deterministically injected markup (the q48
    // inject-then-clean pattern); entity decode order is part of the
    // contract — &amp; last, so &amp;lt; ends as literal &lt;
    "q107_strip_html" -> ((s, d) =>
      Curate.injectHtml(Tables.documents(s, d))
        .select(col("doc_id"), Curate.stripHtml(col("text")).as("text"))),
    "q47_chunks" -> ((s, d) =>
      Curate.chunks(Tables.documents(s, d), chunkLen = 50, stride = 40)),
    // PII injected deterministically first so the scrub provably fires
    "q48_pii_redact" -> ((s, d) =>
      Curate.redactPii(Curate.injectPii(Tables.documents(s, d)))),
    // the end-to-end pipeline: quality gate -> lang filter -> exact dedup
    // -> deterministic sample, in ONE plan with one shuffle
    "q50_curate" -> ((s, d) =>
      Curate.curate(Tables.documents(s, d))),
    // per-source length-percentile band: outlier cut relative to each
    // source's own distribution — one scan, one window shuffle
    "q81_length_band" -> ((s, d) =>
      Curate.lengthBandFilter(Tables.documents(s, d))),
    // operator composition: chunk -> exact-dedup the CHUNKS — finds
    // boilerplate windows repeated across documents (the chunk-level
    // twin of q20's doc-level dedup; dedup-after-chunking is how
    // training pipelines drop repeated headers/footers)
    "q75_chunk_dedup" -> ((s, d) =>
      Curate.chunks(Tables.documents(s, d), chunkLen = 20, stride = 20)
        .groupBy(md5(col("chunk_text").cast("binary")).as("chunk_md5"),
          length(col("chunk_text")).cast("long").as("chunk_len"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("first_doc"))
        .where(col("n_copies") > 1)),
    // content-defined chunking (Curate.contentChunks): Rabin-style
    // rolling-hash boundaries at token granularity (w=4, divisor=64 →
    // ~64-token chunks); the oracle replays the polynomial window hash,
    // the boundary rule, and the prefix-count chunk ids
    "q128_content_chunks" -> ((s, d) =>
      Curate.contentChunks(Tables.documents(s, d))),
    // fastText-style lang-id (LangId.langIdFasttext, Joulin et al. '16):
    // hashed char 2-/3-gram NB with exact integer log2 weights, trained
    // in-plan on the corpus labels, argmax ties to the smallest lang;
    // upgrades the q23 marker-word heuristic. The oracle re-derives the
    // feature fold, the smoothed weight grid, and the argmax
    "q23b_lang_id_ft" -> ((s, d) =>
      LangId.langIdFasttext(Tables.documents(s, d))),
    // per-source corpus datasheet (Quality.datasheet, Gebru et al.
    // '21): volume, exact-duplication exposure (q20 md5 rule — a
    // cross-source dup shows in BOTH rows), and the modal language
    // with its share, all in exact ppm; the oracle replays the df
    // count, the rollups, and the (count desc, lang asc) modal window
    "q195_datasheet" -> ((s, d) =>
      Quality.datasheet(Tables.documents(s, d))),
    // span corruption (Curate.spanCorrupt, T5 §3.1.4): the denoising
    // objective's rewrite — deterministic equal-char segments, segment
    // k masked iff hash48(id‖'sc'‖k) < 15%, sentinel-numbered input +
    // sentinel-keyed target with the closing sentinel; the oracle
    // replays the segment boundaries, all eight hashes, the sentinel
    // cumsum, and both ordered reassemblies
    "q183_span_corrupt" -> ((s, d) =>
      Curate.spanCorrupt(Tables.documents(s, d))),
    // length-grouped batching (Curate.lengthGroupedBatches): the
    // padding-efficiency layout for unpacked fine-tuning — docs sorted
    // by BPE pre-token count into 32-doc batches, each padding only to
    // its own max; global rank via the q109 two-pass partition-offset
    // discipline (16 B/row metadata pass, never text, no global
    // window); the oracle replays the token counts, the (len, id)
    // rank, and the per-batch max
    "q177_length_batches" -> ((s, d) =>
      Curate.lengthGroupedBatches(Tables.documents(s, d), batchSize = 32)),
    // the Aho-Corasick twin DRIVER-GATED against the same oracle
    // (round-11 verdict): blocklistReportAC is the form that actually
    // runs on thousand-phrase policy lists at 100 TB — one broadcast
    // automaton pass per doc instead of N regex scans — so it carries
    // the same hash-match evidence as the unrolled form, not just the
    // ScalaTest equality pin
    "q176b_blocklist_ac" -> ((s, d) =>
      Curate.blocklistReportAC(blocklistFixture(s, d), blocklistPhrases)),
    // jusText-style boilerplate block classification (Boilerplate
    // .classifyBlocks, Pomikalek '11): page-shaped docs synthesized
    // in-plan — nav bar, stopword-boosted body, short date stamp, raw
    // body, link footer — so every context-free class and both neighbor
    // promotion rules occur; the oracle replays block split, token
    // counting, the integer density thresholds, and the IGNORE NULLS
    // neighbor windows
    "q137_boilerplate_blocks" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val page = concat_ws("\n\n",
        lit("@lnk home @lnk about @lnk contact nav menu"),
        concat(col("text"), lit(" the of and to in is on the a of and in")),
        concat(lit("posted "), col("doc_id")),
        col("text"),
        lit("@lnk privacy @lnk terms @lnk copyright site"))
      Boilerplate.classifyBlocks(docs.select(col("doc_id"), page.as("text")))
    }),
    // T5 span corruption (TextAnalysis.spanCorrupt): deterministic
    // md5-coin masking at rate 0.15, adjacent hits merge into sentinel
    // spans; the oracle replays the coin, the run-merge, and both
    // reassemblies with window functions
    "q127_span_corrupt" -> ((s, d) =>
      TextAnalysis.spanCorrupt(Tables.documents(s, d))),
    // string-column ANALYZE stats (binary-collation min/max)
    "q72_string_stats" -> ((s, d) =>
      Stats.stringColumnStats(Tables.customer(s, d), Seq("c_name", "c_mktsegment")))
  )

  val oracleSql: Map[String, String] = Map(
    "q23_lang_id" ->
      """WITH t AS (SELECT doc_id,
        |  LEN(regexp_extract_all(text, '\b(the|a|of|and)\b')) en_hits,
        |  LEN(regexp_extract_all(text, '\b(der|die|und|nicht)\b')) de_hits,
        |  LEN(regexp_extract_all(text, '\b(le|la|et|les)\b')) fr_hits FROM documents)
        |SELECT doc_id, en_hits, de_hits, fr_hits,
        |  CASE WHEN en_hits>=de_hits AND en_hits>=fr_hits THEN 'en'
        |       WHEN de_hits>=fr_hits THEN 'de' ELSE 'fr' END lang_guess
        |FROM t""".stripMargin,
    "q24_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform($toks, t -> CAST(LEN(t)*131 + ascii(SUBSTR(t,1,1)) AS BIGINT))),
         |    (a, b) -> (a*31 + b) % 1000000007) fp,
         |  LENGTH(text) n_chars
         |FROM documents""".stripMargin,
    // chr(769) = U+0301 combining acute (NFC-composes with the preceding
    // 'e'), chr(9) = tab, chr(7) = BEL; DuckDB regexp_replace needs the
    // explicit 'g' flag (Spark's is global by default)
    "q106_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    nfc_normalize(text || ' caf' || 'e' || chr(769) || '  x' || chr(9) || 'y' || chr(7)),
        |    '[\x00-\x08\x0B-\x1F\x7F]+', '', 'g'), '[ '||chr(9)||']+', ' ', 'g')) AS text
        |FROM documents""".stripMargin,
    "q107_strip_html" ->
      """SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(
        |      '<p class="d">title &amp; id ' || doc_id || '</p><br/>' || text
        |        || ' <a href="/x?a=1&amp;b=2">link</a>&nbsp;&lt;end&gt;',
        |      '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS text
        |FROM documents""".stripMargin,
    "q47_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |s AS (SELECT doc_id, tk, len(tk) n FROM t WHERE len(tk) > 0),
        |u AS (SELECT doc_id, tk, n, unnest(range(0, n, 40)) st FROM s)
        |SELECT doc_id, CAST(st // 40 AS BIGINT) chunk_idx,
        |  CAST(len(list_slice(tk, st + 1, least(st + 50, n))) AS BIGINT) n_chunk_tokens,
        |  array_to_string(list_slice(tk, st + 1, least(st + 50, n)), ' ') chunk_text
        |FROM u""".stripMargin,
    "q48_pii_redact" ->
      s"""WITH r AS (SELECT doc_id, concat_ws(' ', substr(text, 1, 40),
         |    concat('contact user', doc_id, '@example.com or call 555-867-5309 now'),
         |    substr(text, 41, 1000000)) AS "text" FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all("text", '$emailPat')) AS BIGINT) n_emails,
         |  CAST(len(regexp_extract_all("text", '$phonePat')) AS BIGINT) n_phones,
         |  regexp_replace(regexp_replace("text", '$emailPat', '[EMAIL]', 'g'),
         |    '$phonePat', '[PHONE]', 'g') AS "text"
         |FROM r""".stripMargin,
    "q128_content_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk,
        |    list_transform(list_filter(regexp_split_to_array(text, '\s+'),
        |        x -> x <> ''),
        |      w -> (CAST(LEN(w) AS BIGINT) * 131 + ascii(substr(w, 1, 1)))
        |        % 1000000007) tv
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
        |    i -> {'pos': i - 1, 'tok': tk[i],
        |          'gh': CASE WHEN i >= 4 THEN
        |            ((((tv[i-3] * 31 + tv[i-2]) % 1000000007) * 31
        |              + tv[i-1]) % 1000000007 * 31 + tv[i]) % 1000000007
        |          END})) u FROM t),
        |r AS (SELECT doc_id, u.pos pos, u.tok tok,
        |    u.gh IS NOT NULL AND u.gh % 64 = 0 b FROM e),
        |k AS (SELECT doc_id, pos, tok,
        |    SUM(CASE WHEN b THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos)
        |      - CASE WHEN b THEN 1 ELSE 0 END chunk_id
        |  FROM r)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) chunk_id,
        |  string_agg(tok, ' ' ORDER BY pos) chunk_text,
        |  CAST(COUNT(*) AS BIGINT) n_chunk_tokens
        |FROM k GROUP BY doc_id, chunk_id""".stripMargin,
    "q23b_lang_id_ft" ->
      """WITH t AS (SELECT doc_id, lang, lower(text) lt FROM documents),
        |cps AS (SELECT doc_id, lang,
        |    list_transform(range(1, length(lt) + 1),
        |      i -> CAST(ascii(substr(lt, i, 1)) AS BIGINT)) cp
        |  FROM t),
        |g AS (SELECT doc_id, lang, unnest(list_concat(
        |    list_transform(range(1, len(cp)),
        |      i -> ((cp[i] * 131 + cp[i+1]) % 1000000007) % 2048),
        |    list_transform(range(1, len(cp) - 1),
        |      i -> ((((cp[i] * 131 + cp[i+1]) % 1000000007) * 131 + cp[i+2])
        |        % 1000000007) % 2048))) bucket
        |  FROM cps),
        |counts AS (SELECT lang, bucket, COUNT(*) c FROM g GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(c) tot FROM counts GROUP BY 1),
        |grid AS (SELECT t.lang, gs.bucket, t.tot, COALESCE(c.c, 0) c
        |  FROM tot t
        |  CROSS JOIN (SELECT unnest(range(0, 2048)) bucket) gs
        |  LEFT JOIN counts c ON c.lang = t.lang AND c.bucket = gs.bucket),
        |w AS (SELECT lang, bucket,
        |    length(bin(CAST((1000000 * (c + 1)) // (tot + 2048) AS BIGINT))) - 1 w
        |  FROM grid),
        |s AS (SELECT g.doc_id, w.lang, SUM(w.w) score
        |  FROM g JOIN w USING (bucket) GROUP BY 1, 2),
        |p AS (SELECT doc_id, lang, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, lang ASC) rn
        |  FROM s)
        |SELECT d.doc_id, d.lang, p.lang lang_pred, CAST(p.score AS BIGINT) score
        |FROM p JOIN documents d USING (doc_id) WHERE p.rn = 1""".stripMargin,
    "q195_datasheet" ->
      """WITH b AS (SELECT doc_id, COALESCE(source, '') source,
        |    COALESCE(lang, '') lang,
        |    COALESCE(length(text), 0) nc,
        |    COALESCE(md5(text), 'n:' || CAST(doc_id AS VARCHAR)) h
        |  FROM documents),
        |d AS (SELECT h, COUNT(*) c FROM b GROUP BY 1),
        |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
        |    CAST(SUM(nc) AS BIGINT) n_chars,
        |    CAST(COUNT(*) FILTER (WHERE c >= 2) AS BIGINT) dd
        |  FROM b JOIN d USING (h) GROUP BY 1),
        |lc AS (SELECT source, lang, COUNT(*) c FROM b GROUP BY 1, 2),
        |tl AS (SELECT source, lang top_lang, c tc FROM (
        |    SELECT source, lang, c, row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, lang ASC) rn FROM lc) WHERE rn = 1)
        |SELECT a.source, n_docs, n_chars,
        |  n_chars // n_docs mean_chars,
        |  (1000000 * dd) // n_docs exact_dup_ppm,
        |  tl.top_lang,
        |  CAST((1000000 * tc) // n_docs AS BIGINT) top_lang_ppm
        |FROM a JOIN tl USING (source)""".stripMargin,
    "q183_span_corrupt" ->
      """WITH d AS (SELECT doc_id, text, length(text) L FROM documents),
        |s AS (SELECT doc_id, text, L, CAST(k AS BIGINT) k
        |      FROM d CROSS JOIN generate_series(0, 7) t(k)
        |      WHERE L >= 8),
        |hx AS (SELECT doc_id, k,
        |    md5(CAST(doc_id AS VARCHAR) || 'sc' || CAST(k AS VARCHAR)) h
        |  FROM s),
        |g AS (SELECT doc_id, k, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hx CROSS JOIN generate_series(1, 12) u(i)
        |  GROUP BY doc_id, k),
        |f AS (SELECT s.doc_id, s.k,
        |    substr(text, CAST((L*k)//8 + 1 AS BIGINT),
        |      CAST((L*(k+1))//8 - (L*k)//8 AS BIGINT)) seg,
        |    (g.v % 1000000) < 150000 flag
        |  FROM s JOIN g USING (doc_id, k)),
        |jx AS (SELECT doc_id, k, seg, flag, COALESCE(SUM(
        |      CASE WHEN flag THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        |      ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) j
        |  FROM f),
        |agg AS (SELECT doc_id,
        |    SUM(CASE WHEN flag THEN 1 ELSE 0 END) nc,
        |    string_agg(CASE WHEN flag
        |        THEN '<extra_id_' || CAST(j AS VARCHAR) || '>'
        |        ELSE seg END, '' ORDER BY k) input_t,
        |    string_agg(CASE WHEN flag
        |        THEN '<extra_id_' || CAST(j AS VARCHAR) || '>' || seg
        |        END, '' ORDER BY k) target_t
        |  FROM jx GROUP BY doc_id)
        |SELECT d.doc_id, d.L >= 8 corrupt_ok,
        |  CAST(COALESCE(nc, 0) AS BIGINT) n_corrupted,
        |  CASE WHEN d.L >= 8 THEN input_t ELSE d.text END input_text,
        |  CASE WHEN COALESCE(nc, 0) > 0
        |    THEN target_t || '<extra_id_' || CAST(nc AS VARCHAR) || '>'
        |    ELSE '' END target_text
        |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q177_length_batches" ->
      """WITH t AS (SELECT doc_id, CAST(LEN(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1 rk FROM t),
        |b AS (SELECT doc_id, n_tokens,
        |    CAST(rk // 32 AS BIGINT) batch_idx FROM r)
        |SELECT doc_id, n_tokens, batch_idx,
        |  CAST(MAX(n_tokens) OVER (PARTITION BY batch_idx) AS BIGINT)
        |    pad_to,
        |  CAST(MAX(n_tokens) OVER (PARTITION BY batch_idx) - n_tokens
        |    AS BIGINT) pad_tokens
        |FROM b""".stripMargin,
    // same report, same planted phrases — the automaton must land on
    // the identical hash
    "q176b_blocklist_ac" -> blocklistOracleSql,
    "q137_boilerplate_blocks" ->
      ("WITH " + boilerplateCtes + """
        |SELECT doc_id, bidx, n_chars, n_tokens, n_links, n_stops, cls,
        |  CASE WHEN cls = 'good' THEN 'good'
        |       WHEN cls = 'bad' THEN 'bad'
        |       WHEN cls = 'near_good' THEN
        |         CASE WHEN pv = 'good' OR nx = 'good' THEN 'good' ELSE 'bad' END
        |       ELSE CASE WHEN pv = 'good' AND nx = 'good' THEN 'good' ELSE 'bad' END
        |  END final_cls
        |FROM cx""".stripMargin),
    "q127_span_corrupt" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
        |    i -> {'pos': i - 1, 'tok': tk[i]})) u FROM t),
        |r AS (SELECT doc_id, u.pos pos, u.tok tok FROM e),
        |c AS (SELECT doc_id, pos, tok,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(pos AS VARCHAR) || ':graft'), 1, 8) < '26666666' m
        |  FROM r),
        |s AS (SELECT doc_id, pos, tok, m,
        |    m AND NOT coalesce(
        |      lag(m) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) st
        |  FROM c),
        |k AS (SELECT doc_id, pos, tok, m, st,
        |    SUM(CASE WHEN st THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) - 1 kk
        |  FROM s),
        |p AS (SELECT doc_id, pos, st,
        |    CASE WHEN NOT m THEN tok
        |         WHEN st THEN '<extra_id_' || CAST(kk AS VARCHAR) || '>' END ip,
        |    CASE WHEN st THEN '<extra_id_' || CAST(kk AS VARCHAR) || '> ' || tok
        |         WHEN m THEN tok END tp
        |  FROM k)
        |SELECT doc_id,
        |  coalesce(string_agg(ip, ' ' ORDER BY pos), '') inputs,
        |  coalesce(string_agg(tp, ' ' ORDER BY pos), '') targets,
        |  CAST(SUM(CASE WHEN st THEN 1 ELSE 0 END) AS BIGINT) n_spans
        |FROM p GROUP BY doc_id""".stripMargin,
    "q50_curate" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |q AS (SELECT doc_id, lang, text, CAST(len(tk) AS BIGINT) n_tokens,
        |    len(list_filter(tk, x ->
        |      list_contains(['the','a','of','and','to','in','is','on'], x))) stop_hits
        |  FROM t),
        |f AS (SELECT * FROM q
        |  WHERE n_tokens >= 20 AND stop_hits * 10 <= 6 * n_tokens
        |    AND lang IN ('en', 'de', 'fr')),
        |d AS (SELECT *, row_number() OVER (
        |    PARTITION BY md5(text), length(text) ORDER BY doc_id) rn FROM f)
        |SELECT doc_id, lang, n_tokens FROM d
        |WHERE rn = 1
        |  AND substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8) < '80000000'""".stripMargin,
    "q81_length_band" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
        |      AS BIGINT) n_tokens
        |  FROM documents),
        |b AS (SELECT doc_id, source, n_tokens,
        |    quantile_cont(n_tokens, 0.05) OVER (PARTITION BY source) p_lo,
        |    quantile_cont(n_tokens, 0.95) OVER (PARTITION BY source) p_hi
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM b
        |WHERE n_tokens >= p_lo AND n_tokens <= p_hi""".stripMargin,
    "q75_chunk_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |s AS (SELECT doc_id, tk, len(tk) n FROM t WHERE len(tk) > 0),
        |u AS (SELECT doc_id, tk, n, unnest(range(0, n, 20)) st FROM s),
        |c AS (SELECT doc_id,
        |        array_to_string(list_slice(tk, st + 1, least(st + 20, n)), ' ') chunk_text
        |      FROM u)
        |SELECT md5(chunk_text) chunk_md5, length(chunk_text) chunk_len,
        |  COUNT(*) n_copies, MIN(doc_id) first_doc
        |FROM c GROUP BY 1, 2 HAVING COUNT(*) > 1""".stripMargin,
    "q72_string_stats" -> Seq("c_name", "c_mktsegment").map(c =>
      s"""SELECT '$c' "column", COUNT($c) n_nonnull,
         |  COUNT(*) - COUNT($c) n_null,
         |  MIN($c) min_s, MAX($c) max_s,
         |  CAST(MAX(LENGTH($c)) AS BIGINT) max_len
         |FROM customer""".stripMargin)
      .mkString("\nUNION ALL\n")
  )
}
