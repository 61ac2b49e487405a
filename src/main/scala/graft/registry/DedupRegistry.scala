package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.{dupClustersCte, toks}
import graft.model.Tables
import graft.ops
import graft.ops.{Curate, Dedup, TextAnalysis}

/** Text-dedup domain registry (round-15 split tranche 10): exact and
  * self-certifying minhash dedup (q20/q25), simhash invariants (q26),
  * n-gram jaccard pairs (q29), duplicate-cluster resolution — both
  * propagation forms, the resolve, spectrum and soft weights
  * (q49/q77/q117/q233/q138), winnowing (q110/q111), line/substring/
  * skeleton dedup (q118/q129/q150), the cross-source overlap matrix
  * (q158), gram novelty (q190) and ROUGE dedup (q203) — each query
  * above its DuckDB oracle. Shared fixtures/CTEs stay in SparkEntry
  * private[graft] where other families (q148 leakage split class)
  * still compose them. Bodies and SQL moved verbatim; the oracle gate
  * re-ran on the split — byte-identical results. */
private[graft] object DedupRegistry {

  /** Mirrors TextAnalysis.winnow stage for stage: per-char polynomial
    * token values, polynomial gram hashes, rightmost window-min via the
    * reversed window, pos*2e9+fp encoding distinct'ed before unnest.
    * Shared by q110 (the fingerprint rows) and q111 (the pair join). */
  private val winnowOracleSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    list_transform($toks, t ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
       |        (a, b) -> (a*131 + b) % 1000000007)) tv
       |  FROM documents),
       |f AS (SELECT doc_id, tv FROM t WHERE LEN(tv) >= 8),
       |g AS (SELECT doc_id,
       |    list_transform(range(1, LEN(tv)-4+2), i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(tv, i, i+3)),
       |        (a, b) -> (a*31 + b) % 1000000007)) gh
       |  FROM f),
       |s AS (SELECT doc_id, list_distinct(
       |    list_transform(range(1, LEN(gh)-5+2), j ->
       |      (j + 5 - list_position(list_reverse(list_slice(gh, j, j+4)),
       |                             list_min(list_slice(gh, j, j+4))))*2000000000
       |        + list_min(list_slice(gh, j, j+4)))) encs
       |  FROM g)
       |SELECT doc_id, enc // 2000000000 pos, enc % 2000000000 fp
       |FROM (SELECT doc_id, unnest(encs) enc FROM s)""".stripMargin

  private val dupClustersOracleSql: String =
    dupClustersCte +
      "\nSELECT node doc_id, MIN(r) cluster_id FROM reach GROUP BY node"

  /** ROUGE-L LCS replay (q203): the anti-diagonal-free row recursion —
    * one recursive-CTE step per OUTER token, the 16 row cells updated
    * left-to-right via lateral column aliases (d1..d16, deliberately
    * NOT named like the carried c1..c16 so DuckDB's resolution order
    * can never pick the stale table column). Uses the monotone
    * three-way form dp[i+1][j] = max(up, left_new, diag + eq), which
    * equals classic LCS because adjacent dp cells differ by at most 1. */
  private val rougeCtes: String = {
    val maxT = 16
    val baseCols = (1 to maxT).map(j => s"0 c$j").mkString(", ")
    val stepCols = (1 to maxT).map { j =>
      val eq = s"CASE WHEN p.ta[s.i + 1] = p.tb[$j] THEN 1 ELSE 0 END"
      if (j == 1) s"greatest(s.c1, $eq) d1"
      else s"greatest(s.c$j, d${j - 1}, s.c${j - 1} + $eq) d$j"
    }.mkString(",\n|      ")
    val cellList = (1 to maxT).map(j => s"s.c$j").mkString(", ")
    s"""rdoc AS MATERIALIZED (SELECT id, tk[1:$maxT] ta, len(tk[1:$maxT]) la
       |  FROM (SELECT id, list_filter(regexp_split_to_array(lower(text),
       |      '\\s+'), x -> x <> '') tk
       |    FROM (SELECT doc_id id, text FROM documents WHERE doc_id < 80
       |          UNION ALL
       |          SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 8
       |          UNION ALL
       |          SELECT doc_id + 2000000, substr(text, 1, 40)
       |          FROM documents WHERE doc_id >= 8 AND doc_id < 16))
       |  WHERE len(tk) >= 1),
       |rpair AS MATERIALIZED (SELECT a.id ia, b.id ib, a.ta ta, b.ta tb,
       |    a.la la, b.la lb
       |  FROM rdoc a JOIN rdoc b ON a.id < b.id),
       |rst AS (SELECT ia, ib, 0 i, $baseCols FROM rpair
       |  UNION ALL
       |  SELECT s.ia, s.ib, s.i + 1,
       |      $stepCols
       |  FROM rst s JOIN rpair p ON p.ia = s.ia AND p.ib = s.ib
       |  WHERE s.i < p.la),
       |rfin AS (SELECT s.ia, s.ib, p.la, p.lb, [$cellList][p.lb] lcs
       |  FROM rst s JOIN rpair p ON p.ia = s.ia AND p.ib = s.ib
       |    AND s.i = p.la)""".stripMargin
  }

  private val dedupResolveOracleSql: String =
    dupClustersCte + ",\n" +
      """c AS (SELECT node doc_id, MIN(r) cluster_id FROM reach GROUP BY node),
        |reps AS (SELECT cluster_id, doc_id FROM (
        |  SELECT c.cluster_id, c.doc_id,
        |    row_number() OVER (PARTITION BY c.cluster_id
        |      ORDER BY d.n_chars DESC, c.doc_id ASC) rn
        |  FROM c JOIN documents d USING (doc_id)) WHERE rn = 1)
        |SELECT d.doc_id, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM c)
        |   OR d.doc_id IN (SELECT doc_id FROM reps)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- training-data pipeline extensions ---
    "q20_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d))),
    // Self-certifying form (round-3): plant a near-duplicate twin
    // (one appended token => shingle jaccard ~ S/(S+1) >= 0.95 for docs
    // with >= 30 tokens) for every eligible doc, run the FULL minhash
    // pipeline over originals+twins, and emit one row per twin asserting
    // it was deduplicated away. The pipeline's engine-specific hashes are
    // not oracle-able; "every planted near-dup is caught" is — a missed
    // twin drops a row and the driver flags the mismatch.
    "q25_minhash_survivors" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val planted = docs
        .where(size(TextAnalysis.tokens(col("text"))) >= 30)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(col("text"), lit(" graftplantedneardup")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(planted)
      val survivors = Dedup.minhashSurvivors(corpus, tau = 0.7)
      planted.select(col("doc_id"))
        .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(true).as("planted_dropped"))
    }),
    // Self-certifying SimHash invariants (round-3): (a) EXACT — SimHash is
    // a bag-of-tokens signature, so reversing token order must not move a
    // single bit; (b) measured — appending one token flips only bits whose
    // vote margin was ~0, bounded well under 64 (threshold has >2x margin
    // over the max observed at sf0.01 AND sf0.1). The raw sig is
    // engine-specific; these properties are what make it a near-dup
    // signature, and any engine can check "TRUE".
    "q26_simhash_sig" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sig = Dedup.simhash(col("text"))
      val sigRev = Dedup.simhash(array_join(reverse(TextAnalysis.tokens(col("text"))), " "))
      val sigMut = Dedup.simhash(concat(col("text"), lit(" graftmutationtoken")))
      docs.select(col("doc_id"),
        (sig === sigRev).as("order_invariant_ok"),
        (bit_count(sig.bitwiseXOR(sigMut)) <= lit(24)).as("robust_ok"))
    }),
    "q29_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d).where(col("doc_id") < 60), n = 2, minJaccard = 0.05)),
    // near-dup pairs (q29's exact-jaccard config) -> connected components;
    // cluster_id = min doc_id = the canonical survivor of each dup set
    "q49_dup_clusters" -> ((s, d) =>
      Curate.dupClusters(Dedup.ngramJaccardPairs(
        Tables.documents(s, d).where(col("doc_id") < 60), n = 2, minJaccard = 0.05))),
    // same pair graph as q49 resolved by the O(log n) large-star/small-star
    // algorithm — the adversarial-depth variant proven against the
    // identical connected-components oracle
    "q77_dup_clusters_star" -> ((s, d) =>
      Curate.dupClustersStar(Dedup.ngramJaccardPairs(
        Tables.documents(s, d).where(col("doc_id") < 60), n = 2, minJaccard = 0.05))),
    // winnowing fingerprints (MOSS): k-gram hashes -> rightmost window
    // minima; the substring-granularity sketch whose fp equi-join finds
    // partial-overlap/boilerplate pairs doc-level hashing misses
    "q110_winnow" -> ((s, d) =>
      TextAnalysis.winnow(Tables.documents(s, d), k = 4, w = 5)),
    // the use case q110 exists for: doc pairs sharing >=2 fingerprints,
    // hot template fps df-capped before pairing (the maxDf discipline)
    "q111_winnow_pairs" -> ((s, d) =>
      TextAnalysis.winnowPairs(Tables.documents(s, d), k = 4, w = 5)),
    // dedup resolution (Curate.resolveDuplicates): q49's verified pair
    // graph resolved to a deduplicated corpus — keep the longest member
    // per cluster (tie: lowest id) plus every never-paired doc; the
    // corpus scans ONCE with broadcast decision frames
    "q117_dedup_resolve" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(
        docs.where(col("doc_id") < 60), n = 2, minJaccard = 0.05)
      Curate.resolveDuplicates(
        docs.select(col("doc_id"), col("source"), col("n_chars")), pairs)
    }),
    // corpus-level duplicate-line removal (Curate.dedupLines, the C4
    // cleaning rule): 3-line docs synthesized in-plan (per-source
    // boilerplate + id-class segment + unique body) so the boilerplate
    // collapses to one corpus-wide first occurrence; reassembly order and
    // the (doc_id, pos) first-occurrence rule are what the oracle pins
    "q118_line_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lined = docs.select(col("doc_id"),
        concat_ws("\n",
          concat(lit("BOILER "), col("source")),
          concat(lit("SEG "), (col("doc_id") % 50).cast("string")),
          col("text")).as("text"))
      Curate.dedupLines(lined)
    }),
    // exact duplicated-span removal (Dedup.exactSubstrDedup, Lee et al.
    // '21 ExactSubstr): every 5-token span occurring >= 2 times in the
    // corpus is cut from all its occurrences, overlapping spans merged;
    // the oracle re-derives dup grams, interval coverage, and the
    // single-space reassembly independently (position-explode form)
    "q129_substr_dedup" -> ((s, d) =>
      Dedup.exactSubstrDedup(Tables.documents(s, d), minLen = 5)),
    // soft deduplication (Curate.softDedupWeights, SoftDedup shape):
    // q49's pair graph resolved to per-doc sampling weights 1/cluster_size
    // instead of drops — integer ppm weights, singletons at full weight;
    // the oracle chains the q49 recursive-CTE clusters with a size join
    "q138_softdedup_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curate.softDedupWeights(docs,
        Dedup.ngramJaccardPairs(docs.where(col("doc_id") < 60), n = 2, minJaccard = 0.05))
    }),
    // homoglyph-spoofed dedup (Dedup.skeletonExact): spam/SEO duplicates
    // swap Cyrillic lookalikes for Latin letters and sprinkle zero-width
    // chars — every token hash changes, so exact AND shingle dedup go
    // blind while the rendered text is identical. The confusable
    // skeleton (lower -> strip ZWSP/ZWNJ/ZWJ/BOM -> TR39-subset
    // translate) collapses the spoof onto its original. Spoofed copies
    // planted in-plan (id%9==4 clones id-4 with aeo->Cyrillic + ZWSP
    // after spaces); oracle replays the synthesis and the skeleton
    "q150_skeleton_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val srcId = when(pmod(col("doc_id"), lit(9)) === 4 && col("doc_id") >= 9,
        col("doc_id") - 4).otherwise(col("doc_id"))
      val joined = docs.select(col("doc_id"), srcId.as("src"))
        .join(docs.select(col("doc_id").as("src"), col("text").as("src_text")), "src")
      val spoofed = when(
        pmod(col("doc_id"), lit(9)) === 4 && col("doc_id") >= 9,
        regexp_replace(translate(col("src_text"), "aeo", "аео"),
          " ", " " + "\u200B"))
        .otherwise(col("src_text"))
      Dedup.skeletonExact(joined.select(col("doc_id"), spoofed.as("text")))
    }),
    // cross-source duplicate-overlap matrix (Dedup.sourceOverlapMatrix):
    // the mixture-planning report — q29's verified near-dup pairs rolled
    // up by unordered source pair with per-source totals; the 300-doc
    // slice keeps every shingle df under the engine's maxDf cap so the
    // uncapped all-pairs oracle replays the identical pair set
    "q158_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlapMatrix(
        Tables.documents(s, d).where(col("doc_id") < 300))),
    // memorization-risk / n-gram novelty (Dedup.gramNovelty, the audit
    // column behind Lee et al. '21): per doc, the ppm of its DISTINCT
    // 5-gram set shared with at least one OTHER document — df is
    // doc-set-based (within-doc repeats are repetition, not
    // memorization evidence), under-n docs surface with NULL dup_ppm;
    // the oracle replays the q129 gram strings with DISTINCT + a
    // doc-count df
    "q190_gram_novelty" -> ((s, d) =>
      Dedup.gramNovelty(Tables.documents(s, d), n = 5)),
    "q203_rouge_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val all = base.where(col("doc_id") < 80)
        .unionByName(base.where(col("doc_id") < 8)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(base.where(col("doc_id") >= 8 && col("doc_id") < 16)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            substring(col("text"), 1, 40).as("text")))
      Dedup.rougeLPairs(all, maxTokens = 16, minRougePpm = 500000L)
    }),
    // dup-cluster size spectrum (Curate.clusterSpectrum): the q49
    // component chain widened with singletons (docs untouched by any
    // pair anchor octave 0 — a pairs-only spectrum overstates the
    // tail), then the octave histogram + integer ls power-law fit
    "q233_dup_spectrum" -> ((s, d) => {
      val docs = Tables.documents(s, d).where(col("doc_id") < 60)
      val cl = Curate.dupClusters(Dedup.ngramJaccardPairs(
        docs, n = 2, minJaccard = 0.05))
      Curate.clusterSpectrum(docs.select(col("doc_id"))
        .join(cl, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")))
    }))

  val oracleSql: Map[String, String] = Map(
    "q20_dedup_exact" ->
      "SELECT MIN(doc_id) doc_id, COUNT(*) dup_cnt FROM documents GROUP BY text",
    // q25/q26/q28/q36/q43 are self-certifying (round-3): the Spark side
    // computes an engine-specific result (minhash/simhash/LSH/IVF/HLL) AND
    // an engine-independent invariant over it; the oracle states what the
    // invariant must evaluate to. A pipeline regression flips booleans or
    // drops rows, so these are real gates, not rubber stamps.
    "q25_minhash_survivors" ->
      s"""SELECT doc_id + 1000000 doc_id, TRUE planted_dropped FROM documents
         |WHERE LEN($toks) >= 30""".stripMargin,
    "q26_simhash_sig" ->
      "SELECT doc_id, TRUE order_invariant_ok, TRUE robust_ok FROM documents",
    "q29_ngram_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) sh
         |  FROM (SELECT doc_id,
         |        list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') tk
         |        FROM documents WHERE doc_id < 60))
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(a.sh || b.sh)) jaccard
         |  FROM t a, t b WHERE a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.05""".stripMargin,
    "q49_dup_clusters" -> dupClustersOracleSql,
    "q77_dup_clusters_star" -> dupClustersOracleSql,
    "q110_winnow" -> winnowOracleSql,
    "q111_winnow_pairs" ->
      s"""WITH w AS ($winnowOracleSql),
         |d AS (SELECT DISTINCT doc_id, fp FROM w),
         |c AS (SELECT fp FROM d GROUP BY fp HAVING COUNT(*) <= 100),
         |k AS (SELECT d.doc_id, d.fp FROM d JOIN c USING (fp))
         |SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) shared_fps
         |FROM k a JOIN k b USING (fp)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    "q117_dedup_resolve" -> dedupResolveOracleSql,
    "q118_line_dedup" ->
      """WITH x AS (SELECT doc_id,
        |    'BOILER ' || source || chr(10) || 'SEG ' ||
        |      CAST(doc_id % 50 AS VARCHAR) || chr(10) || text AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) l FROM x),
        |ln AS (SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
        |    i -> {'pos': i, 'line': l[i]})) u FROM ls),
        |l2 AS (SELECT doc_id, u.pos pos, u.line line FROM ln),
        |k AS (SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) rn FROM l2)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |FROM k WHERE rn = 1 GROUP BY doc_id""".stripMargin,
    // Independent re-derivation of ExactSubstr: the oracle marks every
    // token position covered by a duplicated 5-gram by EXPLODING the
    // coverage ranges (simple O(n*L) form), where the engine merges
    // intervals relationally — agreement proves the island-merge +
    // gap-reassembly pipeline equals the positionwise definition.
    "q129_substr_dedup" ->
      """WITH base AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |sized AS (SELECT doc_id, tk, len(tk) n FROM base),
        |occ AS (SELECT doc_id, unnest(range(1, n - 5 + 2)) p, tk
        |  FROM sized WHERE n >= 5),
        |g AS (SELECT doc_id, p,
        |    md5(array_to_string(tk[p:p+4], ' ')) h
        |  FROM occ),
        |dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
        |hits AS (SELECT doc_id, p FROM g WHERE h IN (SELECT h FROM dup)),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) i FROM hits),
        |toks AS (SELECT doc_id, unnest(tk) tok,
        |    unnest(range(1, len(tk) + 1)) i
        |  FROM sized),
        |kept AS (SELECT t.doc_id,
        |    COALESCE(string_agg(t.tok, ' ' ORDER BY t.i)
        |      FILTER (WHERE c.i IS NULL), '') kept_text,
        |    COUNT(*) FILTER (WHERE c.i IS NOT NULL) n_removed
        |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.i
        |  GROUP BY t.doc_id)
        |SELECT s.doc_id, CAST(s.n AS BIGINT) n_tokens,
        |  CAST(COALESCE(k.n_removed, 0) AS BIGINT) n_removed,
        |  COALESCE(k.kept_text, '') kept_text
        |FROM sized s LEFT JOIN kept k ON s.doc_id = k.doc_id""".stripMargin,
    "q138_softdedup_weights" ->
      (dupClustersCte + ",\n" +
        """c AS (SELECT node doc_id, MIN(r) cluster_id FROM reach GROUP BY node),
          |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) n FROM c GROUP BY 1)
          |SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) cluster_id,
          |  COALESCE(sz.n, 1) cluster_size,
          |  1000000 // COALESCE(sz.n, 1) weight_ppm
          |FROM documents d LEFT JOIN c USING (doc_id)
          |  LEFT JOIN sz ON sz.cluster_id = c.cluster_id""".stripMargin),
    "q150_skeleton_dedup" ->
      """WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 4 AND doc_id >= 9 THEN doc_id - 4
        |         ELSE doc_id END s
        |  FROM documents),
        |d AS (SELECT src.doc_id,
        |    CASE WHEN src.doc_id % 9 = 4 AND src.doc_id >= 9
        |      THEN replace(translate(t.text, 'aeo', 'аео'),
        |                   ' ', ' ' || chr(8203))
        |      ELSE t.text END AS text
        |  FROM src JOIN documents t ON t.doc_id = src.s),
        |sk AS (SELECT doc_id,
        |    translate(regexp_replace(lower(text),
        |        '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |      'аеорсхуіѕјһԁԛ', 'aeopcxyisjhdq') k,
        |    lower(text) lt
        |  FROM d)
        |SELECT MIN(doc_id) doc_id, CAST(COUNT(*) AS BIGINT) dup_cnt,
        |  MAX(k <> lt) any_spoofed
        |FROM sk GROUP BY k""".stripMargin,
    "q158_source_overlap" ->
      s"""WITH docs AS (SELECT * FROM documents WHERE doc_id < 300),
         |t AS (
         |  SELECT doc_id, list_distinct(
         |    CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) sh
         |  FROM (SELECT doc_id,
         |        list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') tk
         |        FROM docs)),
         |pairs AS (SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id doc_a, b.doc_id doc_b,
         |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(a.sh || b.sh)) jaccard
         |    FROM t a, t b WHERE a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.05),
         |ps AS (SELECT LEAST(sa.source, sb.source) source_a,
         |              GREATEST(sa.source, sb.source) source_b
         |       FROM pairs JOIN docs sa ON pairs.doc_a = sa.doc_id
         |                  JOIN docs sb ON pairs.doc_b = sb.doc_id),
         |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_docs
         |        FROM docs GROUP BY 1)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) n_dup_pairs,
         |       ta.n_docs docs_a, tb.n_docs docs_b
         |FROM ps JOIN tot ta ON ps.source_a = ta.source
         |        JOIN tot tb ON ps.source_b = tb.source
         |GROUP BY 1, 2, ta.n_docs, tb.n_docs""".stripMargin,
    "q190_gram_novelty" ->
      """WITH sized AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> '')) n
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, md5(array_to_string(tk[p:p+4], ' ')) h
        |  FROM (SELECT doc_id, tk, unnest(range(1, n - 5 + 2)) p
        |        FROM sized WHERE n >= 5)),
        |df AS (SELECT h, COUNT(*) c FROM g GROUP BY 1),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_grams,
        |    CAST(COUNT(*) FILTER (WHERE c >= 2) AS BIGINT) dup_grams
        |  FROM g JOIN df USING (h) GROUP BY 1)
        |SELECT s.doc_id, COALESCE(n_grams, 0) n_grams,
        |  COALESCE(dup_grams, 0) dup_grams,
        |  CASE WHEN COALESCE(n_grams, 0) > 0
        |    THEN (1000000 * dup_grams) // n_grams END dup_ppm
        |FROM sized s LEFT JOIN per USING (doc_id)""".stripMargin,
    // ROUGE-L LCS replay: recursive row DP (see rougeCtes)
    "q203_rouge_dedup" ->
      ("WITH RECURSIVE " + rougeCtes + """
        |SELECT ia doc_a, ib doc_b, CAST(la AS BIGINT) la,
        |  CAST(lb AS BIGINT) lb, CAST(lcs AS BIGINT) lcs,
        |  CAST((2000000 * lcs) // (la + lb) AS BIGINT) rouge_ppm
        |FROM rfin WHERE (2000000 * lcs) // (la + lb) >= 500000""".stripMargin),
    // dup-spectrum replay: the q49 recursive component chain, the
    // singleton left join, octave rollups, and the zipf-fit ls device
    // (det >= 0 by Cauchy-Schwarz; numerators sign-factored)
    "q233_dup_spectrum" ->
      (dupClustersCte + """,
        |cl AS (SELECT node doc_id, MIN(r) cluster_id FROM reach
        |  GROUP BY node),
        |alld AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id)
        |      cluster_id
        |  FROM (SELECT doc_id FROM documents WHERE doc_id < 60) d
        |  LEFT JOIN cl USING (doc_id)),
        |sz AS (SELECT cluster_id, COUNT(*) csize FROM alld GROUP BY 1),
        |o AS (SELECT length(bin(CAST(csize AS BIGINT))) - 1 octave,
        |    COUNT(*) n_clusters, CAST(SUM(csize) AS BIGINT) n_docs
        |  FROM sz GROUP BY 1),
        |yc AS (SELECT octave, n_clusters, n_docs,
        |    (length(bin(CAST(n_clusters AS BIGINT))) - 1) * 1000 y_milli,
        |    octave + 1 x FROM o),
        |s2 AS (SELECT COUNT(*) n_oct, SUM(x) sx, SUM(y_milli) sy,
        |    SUM(x * y_milli) sxy, SUM(x * x) sxx FROM yc),
        |f2 AS (SELECT n_oct * sxx - sx * sx AS det,
        |    n_oct * sxy - sx * sy AS num_s,
        |    sy * sxx - sx * sxy AS num_i FROM s2)
        |SELECT CAST(octave AS BIGINT) octave,
        |  CAST(n_clusters AS BIGINT) n_clusters, n_docs,
        |  CAST(y_milli AS BIGINT) y_milli,
        |  CAST(CASE WHEN det = 0 THEN NULL ELSE
        |    (CASE WHEN num_s < 0 THEN -1 ELSE 1 END) * (abs(num_s) // det)
        |  END AS BIGINT) slope_milli,
        |  CAST(CASE WHEN det = 0 THEN NULL ELSE
        |    (CASE WHEN num_i < 0 THEN -1 ELSE 1 END) * (abs(num_i) // det)
        |  END AS BIGINT) intercept_milli
        |FROM yc CROSS JOIN f2""".stripMargin))
}
