package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Curate, Dedup, Pipeline, Retrieval, Similarity}
import graft.SparkEntry.dupClustersCte

/** Contamination / decontamination domain registry: benchmark-leak
  * detection and removal over the `documents` corpus — exact 5-gram
  * decontamination (q68) and its bloom-prefilter scale path (q91),
  * the corpus-wide overlap report (q132), leakage-safe splitting over
  * near-dup components (q148), the BM25-shortlisted two-stage triage
  * (q149), semantic (embedding) contamination (q189), and the
  * composed sweep / audit / streamable-gate pipelines (q243 / q250 /
  * q249). Mechanical move out of SparkEntry (registry-split tranche
  * 13): queries and SQL moved verbatim; the oracle gate re-ran on the
  * split — byte-identical results. The shared in-plan bench synthesis
  * ([[contamBench]]) and its DuckDB CTE twins moved with it. */
private[graft] object ContaminationRegistry {

  /** The shared contamination BENCH synthesis (q149/q243/q249/q250):
    * verbatim corpus copies (%50==0), 40-token partials with novel
    * tails (%50==25, ids +5e5 — high-but-partial overlap), and five
    * fresh items (ids +1e6 — must read provably clean). One
    * definition; the matching DuckDB `bt` CTE lives in
    * [[contamBenchCte]]. */
  private def contamBench(s: SparkSession, docs: DataFrame): DataFrame = {
    val tk = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val verbatim = docs.where(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val partial = docs.where(pmod(col("doc_id"), lit(50)) === 25)
      .select((col("doc_id") + 500000L).as("bench_id"),
        array_join(concat(slice(tk, 1, 40), array(
          concat(lit("novel"), col("doc_id"), lit("_a")),
          concat(lit("novel"), col("doc_id"), lit("_b")),
          concat(lit("novel"), col("doc_id"), lit("_c")),
          concat(lit("novel"), col("doc_id"), lit("_d")),
          concat(lit("novel"), col("doc_id"), lit("_e")))), " ").as("text"))
    val fresh = s.range(5).select((col("id") + 1000000L).as("bench_id"),
      concat_ws(" ", (1 to 8).map(j =>
        concat(lit("benchfresh"), col("id"), lit(s"_$j"))): _*).as("text"))
    verbatim.unionByName(partial).unionByName(fresh)
  }

  /** The q149/q243/q249/q250 shared contamination-bench CTEs — [[contamBench]]'s DuckDB twin (tokd + the bt synthesis). No leading WITH. */
  private val contamBenchCte: String =
    """tokd AS (SELECT doc_id, list_filter(
      |    regexp_split_to_array(lower(text), '\s+'), t -> t <> '') tk
      |  FROM documents),
      |bt AS (
      |  SELECT doc_id bench_id, tk btk FROM tokd WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 500000, list_concat(tk[1:40], [
      |      'novel'||doc_id||'_a', 'novel'||doc_id||'_b',
      |      'novel'||doc_id||'_c', 'novel'||doc_id||'_d',
      |      'novel'||doc_id||'_e'])
      |  FROM tokd WHERE doc_id % 50 = 25
      |  UNION ALL
      |  SELECT 1000000 + i, list_transform(range(1, 9),
      |      j -> 'benchfresh'||i||'_'||j)
      |  FROM range(5) t(i))""".stripMargin

  /** The shared fixed-point BM25 scoring CTEs over (tokd, bt): q..sc. */
  private val contamScoreCtes: String =
    """q AS (SELECT bench_id, list_distinct(btk) qt FROM bt),
      |post AS (SELECT doc_id, len(tk) dl, unnest(tk) t FROM tokd),
      |pc AS (SELECT t, doc_id, dl, COUNT(*) tf FROM post GROUP BY 1, 2, 3),
      |docl AS (SELECT DISTINCT doc_id, dl FROM pc),
      |stats AS (SELECT n_docs, (tot * 1000) // n_docs avg_fx
      |  FROM (SELECT COUNT(*) n_docs, SUM(dl) tot FROM docl)),
      |qt AS (SELECT bench_id, unnest(qt) t FROM q),
      |dfq AS (SELECT t, COUNT(*) df FROM pc
      |  WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY 1),
      |sc AS (SELECT m.bench_id, m.doc_id, SUM(
      |    ( (((2*s.n_docs - 2*dfq.df + 1) * 1000000) // (2*dfq.df + 1))
      |    * ((22 * m.tf * s.avg_fx * 1000)
      |       // (10*s.avg_fx*m.tf + 3*s.avg_fx + 9000*m.dl)) ) // 1000) score_fx
      |  FROM (SELECT qt.bench_id, pc.doc_id, pc.tf, pc.dl, pc.t
      |        FROM pc JOIN qt USING (t)) m
      |    JOIN dfq USING (t) CROSS JOIN stats s
      |  GROUP BY 1, 2)""".stripMargin

  /** The shared corpus-wide distinct-gram pair CTEs: cg..ps. */
  private val contamPairCtes: String =
    """cg AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
      |    ELSE list_transform(range(1, len(tk) - 3), i ->
      |      tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
      |    END)) g
      |  FROM tokd),
      |bs AS (SELECT bench_id, list_distinct(
      |    CASE WHEN len(btk) < 5 THEN [array_to_string(btk, ' ')]
      |    ELSE list_transform(range(1, len(btk) - 3), i ->
      |      btk[i]||' '||btk[i+1]||' '||btk[i+2]||' '||btk[i+3]||' '||btk[i+4])
      |    END) bg FROM bt),
      |bsz AS (SELECT bench_id, len(bg) bench_grams FROM bs),
      |bgr AS (SELECT bench_id, unnest(bg) g FROM bs),
      |ps AS (SELECT bgr.bench_id, cg.doc_id, COUNT(*) ns
      |  FROM bgr JOIN cg USING (g) GROUP BY 1, 2)""".stripMargin

  /** The per-doc lexical fold over (ps, bsz). */
  private val contamLexdCte: String =
    """lexd AS (SELECT ps.doc_id, CAST(COUNT(*) AS BIGINT) n_lex_bench,
      |    CAST(MAX((ns * 1000000) // bench_grams) AS BIGINT) lex_ppm
      |  FROM ps JOIN bsz USING (bench_id)
      |  WHERE ns * 100 >= bench_grams * 20 AND bench_grams > 0
      |  GROUP BY 1)""".stripMargin

  /** The q189 probe-cosine CTEs folded per doc: b2..semd. */
  private val contamSemCtes: String =
    """b2 AS (SELECT vec_id + 1000000 qid,
      |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) qv
      |  FROM embeddings WHERE vec_id < 8
      |  UNION ALL
      |  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
      |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 103),
      |c2 AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nv
      |      FROM embeddings),
      |s2 AS (SELECT nid,
      |    FLOOR(list_cosine_similarity(qv, nv) * 1000 + 0.5) / 1000.0 cos3
      |  FROM c2, b2 WHERE qid <> nid),
      |semd AS (SELECT nid doc_id, CAST(COUNT(*) AS BIGINT) n_probes_hit,
      |    MAX(cos3) max_cos3
      |  FROM s2 WHERE cos3 >= 0.6 GROUP BY 1)""".stripMargin

  /** Shared by q68 (exact decontamination) and q91 (bloom-prefiltered) —
    * the bloom path guarantees zero false negatives, so both forms must
    * hash-match the same oracle rows. */
  private val decontaminateOracleSql: String =
    """WITH t AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
      |         ELSE list_transform(range(1, len(tk) - 3), i ->
      |           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
      |           tk[i+3] || ' ' || tk[i+4]) END) sh
      |  FROM (SELECT doc_id,
      |        list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') tk
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(sh) s FROM t WHERE doc_id >= 400),
      |corp AS (SELECT doc_id, unnest(sh) s FROM t WHERE doc_id < 400),
      |agg AS (SELECT c.doc_id, COUNT(*) n_shingles, COUNT(b.s) n_shared
      |        FROM corp c LEFT JOIN bench b ON c.s = b.s GROUP BY 1)
      |SELECT doc_id, n_shingles, n_shared,
      |  n_shared * 100 > 20 * n_shingles contaminated FROM agg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eval-contamination report (Curate.overlapReport, GPT-3 appendix C /
    // Lee et al. '21 methodology): benchmark synthesized in-plan as
    // 30-token corpus prefixes + novel suffixes, so hit fractions and
    // longest verbatim runs are nontrivial; the oracle re-derives gram
    // keys, hit marking, and the consecutive-run islands
    "q132_overlap_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tk = filter(split(col("text"), "\\s+"), t => length(t) > 0)
      val bench = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), array_join(concat(slice(tk, 1, 30), array(
          concat(lit("novel"), col("doc_id"), lit("_a")),
          concat(lit("novel"), col("doc_id"), lit("_b")),
          concat(lit("novel"), col("doc_id"), lit("_c")),
          concat(lit("novel"), col("doc_id"), lit("_d")),
          concat(lit("novel"), col("doc_id"), lit("_e")))), " ").as("text"))
      Curate.overlapReport(docs, bench, n = 5)
    }),
    // leakage-safe split (Curate.leakageSafeSplit): near-duplicates must
    // land in the SAME split — the split hash keys by the q49 near-dup
    // CLUSTER label (singletons by their own id), so an eval doc can
    // never have a train-side near-twin. Oracle chains the q49
    // recursive-CTE component resolution into the q100 md5 split rule
    "q148_leakage_safe_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.ngramJaccardPairs(
        docs.where(col("doc_id") < 60), n = 2, minJaccard = 0.05)
      Curate.leakageSafeSplit(docs, pairs)
    }),
    // two-stage contamination triage (Retrieval.contaminationTriage):
    // BM25 shortlists suspects through the postings index, exact 5-gram
    // overlap verifies ONLY shortlisted pairs — the scale alternative to
    // q132's corpus-wide gram pass. Bench classes planted in-plan:
    // verbatim copies (top-1 self, full overlap), 40-token partials with
    // novel tails (high-but-partial overlap), fresh items (no lexical
    // hit -> absent, the suspects-only contract)
    "q149_contamination_triage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Retrieval.contaminationTriage(docs, contamBench(s, docs))
    }),
    // the composed DECONTAMINATION verdict (Pipeline.contaminationSweep):
    // the q132/q149 lexical gram evidence, the q149 BM25 triage, and the
    // q189 semantic cosine folded to ONE reason-coded per-doc verdict
    // (lexical > semantic > bm25_suspect > clean); fixture = the q149
    // bench synthesis (verbatim/partial/fresh) + the q189 probe set,
    // doc vectors ride the 1:1 vec_id=doc_id embeddings
    "q243_contamination_sweep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val probes = emb.where(col("vec_id") < 8).select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .unionByName(emb.where(col("vec_id") >= 100 && col("vec_id") < 103)
          .select((col("vec_id") + lit(2000000L)).as("vec_id"),
            col("embedding")))
      Pipeline.contaminationSweep(docs, contamBench(s, docs), emb, probes)
    }),
    // bench-side contamination audit (Pipeline.contaminationAudit):
    // which eval items leaked, how widely, and which are provably
    // clean — fresh items surface with 0 contaminated docs (the q217
    // zero-hit discipline), verbatim items read full-corpus-side
    // overlap, partials read their truncated fraction
    "q250_contamination_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Pipeline.contaminationAudit(docs, contamBench(s, docs))
    }),
    // the STREAMABLE contamination gate, batch-oracled
    // (Pipeline.contaminationGate): the q243 legs with the BM25 triage
    // swapped to the frozen-reference threshold form residents run —
    // frozen stats derive from the corpus itself here, so the oracle
    // replays idf/avgdl exactly; threshold 11e6 fx sits at the
    // corpus's ~95th max-score percentile (a planted suspect TIER, not
    // half the corpus — scores cluster tightly on this synthesis)
    "q249_contamination_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = contamBench(s, docs)
      val emb = Tables.embeddings(s, d)
      val probes = emb.where(col("vec_id") < 8).select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .unionByName(emb.where(col("vec_id") >= 100 && col("vec_id") < 103)
          .select((col("vec_id") + lit(2000000L)).as("vec_id"),
            col("embedding")))
      Pipeline.contaminationGate(
        docs.join(emb.select(col("vec_id").as("doc_id"),
          col("embedding")), Seq("doc_id")),
        bench, probes,
        Retrieval.bm25Frozen(docs, bench, queryIdCol = "bench_id"),
        minScoreFx = 11000000L)
    }),
    // SEMANTIC benchmark contamination (Similarity.semanticContamination):
    // the embedding-space sibling of q149's lexical triage — the probe
    // set plants 8 scaled twins (2*v, exact cos 1.0 with their source;
    // the q28 IEEE power-of-two argument) and 3 raw copies, so the
    // drop list provably contains the planted sources plus whatever
    // natural neighbors clear 0.6; cosines round to 3dp BEFORE the
    // threshold and the max (the q30 device), so the float hash is
    // engine-stable
    "q189_semantic_contamination" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.where(col("vec_id") < 8).select(
          (col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .unionByName(emb.where(col("vec_id") >= 100 && col("vec_id") < 103)
          .select((col("vec_id") + lit(2000000L)).as("vec_id"),
            col("embedding")))
      Similarity.semanticContamination(emb, probes, minCos = 0.6)
    }),
    // q68's decontamination through the bloom prefilter (the benchmark-
    // too-big-to-broadcast scale path) — false negatives are impossible,
    // so the output is bit-identical to q68 and shares its oracle form
    "q91_decontaminate_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curate.decontaminateBloom(docs.where(col("doc_id") < 400),
        docs.where(col("doc_id") >= 400), n = 5, maxSharedRatio = 0.2)
    }),
    // benchmark decontamination: 5-gram overlap of corpus docs against a
    // held-out benchmark split — the pre-training eval-leak check
    "q68_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curate.decontaminate(docs.where(col("doc_id") < 400),
        docs.where(col("doc_id") >= 400), n = 5, maxSharedRatio = 0.2)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q132_overlap_report" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') tk
        |  FROM documents),
        |bench AS (SELECT doc_id, list_concat(tk[1:30],
        |    ['novel' || doc_id || '_a', 'novel' || doc_id || '_b',
        |     'novel' || doc_id || '_c', 'novel' || doc_id || '_d',
        |     'novel' || doc_id || '_e']) btk
        |  FROM tok WHERE doc_id % 10 = 0),
        |bpos AS (SELECT doc_id, unnest(range(1, len(btk) - 5 + 2)) p, btk
        |  FROM bench WHERE len(btk) >= 5),
        |bg AS (SELECT doc_id, p,
        |    md5(array_to_string(btk[p:p+4], ' ')) h FROM bpos),
        |cg AS (SELECT DISTINCT md5(array_to_string(tk[p:p+4], ' ')) h
        |  FROM (SELECT doc_id, unnest(range(1, len(tk) - 5 + 2)) p, tk
        |    FROM tok WHERE len(tk) >= 5)),
        |hits AS (SELECT bg.doc_id, bg.p,
        |    CASE WHEN cg.h IS NOT NULL THEN 1 END hit
        |  FROM bg LEFT JOIN cg ON bg.h = cg.h),
        |runs AS (SELECT doc_id, MAX(run) longest FROM (
        |    SELECT doc_id, COUNT(*) run FROM (
        |      SELECT doc_id, p,
        |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) grp
        |      FROM hits WHERE hit = 1)
        |    GROUP BY doc_id, grp)
        |  GROUP BY doc_id),
        |agg AS (SELECT h.doc_id, COUNT(*) n_grams, COUNT(h.hit) n_hit
        |  FROM hits h GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(COALESCE(a.n_grams, 0) AS BIGINT) n_grams,
        |  CAST(COALESCE(a.n_hit, 0) AS BIGINT) n_hit,
        |  COALESCE(CAST(a.n_hit AS DOUBLE) / a.n_grams, 0.0) overlap_frac,
        |  CAST(COALESCE(r.longest, 0) AS BIGINT) longest_run,
        |  COALESCE(a.n_hit * 100 > 20 * a.n_grams, FALSE) contaminated
        |FROM bench b LEFT JOIN agg a USING (doc_id)
        |  LEFT JOIN runs r USING (doc_id)""".stripMargin,
    "q189_semantic_contamination" ->
      """WITH b AS (SELECT vec_id + 1000000 qid,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) qv
        |  FROM embeddings WHERE vec_id < 8
        |  UNION ALL
        |  SELECT vec_id + 2000000, CAST(embedding AS DOUBLE[])
        |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 103),
        |c AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nv
        |      FROM embeddings),
        |s AS (SELECT nid,
        |    FLOOR(list_cosine_similarity(qv, nv) * 1000 + 0.5) / 1000.0 cos3
        |  FROM c, b WHERE qid <> nid)
        |SELECT nid, CAST(COUNT(*) AS BIGINT) n_probes_hit, MAX(cos3) max_cos3
        |FROM s WHERE cos3 >= 0.6 GROUP BY nid""".stripMargin,
    "q149_contamination_triage" ->
      ("WITH " + contamBenchCte + ",\n" +
      contamScoreCtes + ",\n" +
      """r AS (SELECT bench_id, doc_id, score_fx, row_number() OVER (
        |    PARTITION BY bench_id ORDER BY score_fx DESC, doc_id ASC) rk
        |  FROM sc),
        |hits AS (SELECT bench_id, doc_id, score_fx, rk FROM r WHERE rk <= 3),
        |cg AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
        |    ELSE list_transform(range(1, len(tk) - 3), i ->
        |      tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
        |    END)) g
        |  FROM tokd WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
        |bs AS (SELECT bench_id, list_distinct(
        |    CASE WHEN len(btk) < 5 THEN [array_to_string(btk, ' ')]
        |    ELSE list_transform(range(1, len(btk) - 3), i ->
        |      btk[i]||' '||btk[i+1]||' '||btk[i+2]||' '||btk[i+3]||' '||btk[i+4])
        |    END) bg FROM bt),
        |bsz AS (SELECT bench_id, len(bg) bench_grams FROM bs),
        |bgr AS (SELECT bench_id, unnest(bg) g FROM bs),
        |ps AS (SELECT bgr.bench_id, cg.doc_id, COUNT(*) ns
        |  FROM bgr JOIN cg USING (g) GROUP BY 1, 2)
        |SELECT h.bench_id, CAST(h.rk AS BIGINT) rank, h.doc_id,
        |  CAST(h.score_fx AS BIGINT) score_fx,
        |  CAST(z.bench_grams AS BIGINT) bench_grams,
        |  CAST(COALESCE(ps.ns, 0) AS BIGINT) n_shared,
        |  COALESCE(ps.ns, 0) * 100 >= z.bench_grams * 20
        |    AND z.bench_grams > 0 contaminated
        |FROM hits h JOIN bsz z USING (bench_id)
        |  LEFT JOIN ps USING (bench_id, doc_id)""".stripMargin),
    "q148_leakage_safe_split" ->
      (dupClustersCte + s""",
        |c AS (SELECT node doc_id, MIN(r) cluster_id FROM reach GROUP BY node),
        |k AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) split_key
        |  FROM documents d LEFT JOIN c USING (doc_id))
        |SELECT doc_id, split_key,
        |  CASE WHEN substr(md5(CAST(split_key AS VARCHAR) || 'graft'), 1, 8)
        |         < '${graft.ops.Curate.hashSampleThreshold(0.8)}' THEN 'train'
        |       WHEN substr(md5(CAST(split_key AS VARCHAR) || 'graft'), 1, 8)
        |         < '${graft.ops.Curate.hashSampleThreshold(0.8 + 0.1)}' THEN 'val'
        |       ELSE 'test' END split
        |FROM k""".stripMargin),
    "q68_decontaminate" -> decontaminateOracleSql,
    // bloom prefilter provably changes nothing: same oracle as q68
    "q91_decontaminate_bloom" -> decontaminateOracleSql,
    // decontamination-sweep replay: the q149 bench/BM25/pair-shared
    // CTEs with the gram leg widened corpus-wide, the q189 probe
    // cosines, and the precedence CASE
    "q243_contamination_sweep" ->
      ("WITH " + contamBenchCte + ",\n" +
      contamScoreCtes + ",\n" +
      """r AS (SELECT bench_id, doc_id, score_fx, row_number() OVER (
        |    PARTITION BY bench_id ORDER BY score_fx DESC, doc_id ASC) rk
        |  FROM sc),
        |sus AS (SELECT doc_id, CAST(MIN(rk) AS BIGINT) bm25_rank
        |  FROM r WHERE rk <= 3 GROUP BY 1),""".stripMargin + "\n" +
      contamPairCtes + ",\n" +
      contamLexdCte + ",\n" +
      contamSemCtes + "\n" +
      """SELECT d.doc_id, COALESCE(n_lex_bench, 0) n_lex_bench, lex_ppm,
        |  bm25_rank, COALESCE(n_probes_hit, 0) n_probes_hit, max_cos3,
        |  CASE WHEN COALESCE(n_lex_bench, 0) > 0 THEN 'lexical'
        |       WHEN COALESCE(n_probes_hit, 0) > 0 THEN 'semantic'
        |       WHEN bm25_rank IS NOT NULL THEN 'bm25_suspect'
        |       ELSE 'clean' END verdict,
        |  CASE WHEN COALESCE(n_lex_bench, 0) > 0 THEN FALSE
        |       WHEN COALESCE(n_probes_hit, 0) > 0 THEN FALSE
        |       WHEN bm25_rank IS NOT NULL THEN FALSE
        |       ELSE TRUE END kept
        |FROM documents d LEFT JOIN lexd USING (doc_id)
        |  LEFT JOIN sus USING (doc_id) LEFT JOIN semd USING (doc_id)""".stripMargin),
    // audit replay: the q243 pair CTEs folded bench-side, zero-hit
    // items surfaced through the LEFT JOIN from the full bench frame
    "q250_contamination_audit" ->
      ("WITH " + contamBenchCte + ",\n" +
      contamPairCtes + ",\n" +
      """hits AS (SELECT ps.bench_id, CAST(COUNT(*) AS BIGINT) nd,
        |    CAST(MAX((ns * 1000000) // bench_grams) AS BIGINT) mp
        |  FROM ps JOIN bsz USING (bench_id)
        |  WHERE ns * 100 >= bench_grams * 20 AND bench_grams > 0
        |  GROUP BY 1)
        |SELECT bsz.bench_id, CAST(bench_grams AS BIGINT) bench_grams,
        |  COALESCE(nd, 0) n_contaminated, mp max_overlap_ppm
        |FROM bsz LEFT JOIN hits USING (bench_id)""".stripMargin),
    // frozen-gate replay: the q243 CTEs with the rank cut swapped for
    // the threshold filter over the SAME fixed-point score chain
    // (reference == corpus, so the frozen idf/avgdl equal the live ones
    // and the arithmetic is shared verbatim)
    "q249_contamination_gate" ->
      ("WITH " + contamBenchCte + ",\n" +
      contamScoreCtes + ",\n" +
      """sus AS (SELECT doc_id, CAST(MAX(score_fx) AS BIGINT) bm25_score_fx
        |  FROM sc WHERE score_fx >= 11000000 GROUP BY 1),""".stripMargin + "\n" +
      contamPairCtes + ",\n" +
      contamLexdCte + ",\n" +
      contamSemCtes + "\n" +
      """SELECT d.doc_id, COALESCE(n_lex_bench, 0) n_lex_bench, lex_ppm,
        |  bm25_score_fx, COALESCE(n_probes_hit, 0) n_probes_hit, max_cos3,
        |  CASE WHEN COALESCE(n_lex_bench, 0) > 0 THEN 'lexical'
        |       WHEN COALESCE(n_probes_hit, 0) > 0 THEN 'semantic'
        |       WHEN bm25_score_fx IS NOT NULL THEN 'bm25_suspect'
        |       ELSE 'clean' END verdict,
        |  CASE WHEN COALESCE(n_lex_bench, 0) > 0 THEN FALSE
        |       WHEN COALESCE(n_probes_hit, 0) > 0 THEN FALSE
        |       WHEN bm25_score_fx IS NOT NULL THEN FALSE
        |       ELSE TRUE END kept
        |FROM documents d LEFT JOIN lexd USING (doc_id)
        |  LEFT JOIN sus USING (doc_id) LEFT JOIN semd USING (doc_id)""".stripMargin)
  )
}
