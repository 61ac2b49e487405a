package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.{aucFoldSql, bm25Cte, logregCtes}
import graft.model.Tables
import graft.ops.{Chat, Kmv, Quality, QualityModel, Retrieval, Similarity, Stats}

/** Evaluation-metrics domain registry (round-15 split tranche 3):
  * agreement (q181 kappa, q235 gamma), calibration (q182, ECE),
  * classifier ranking (q231/q232/q234 AUC), generation eval (q223
  * pass@k, q230 majority vote) and ranked-retrieval metrics (q220
  * recall/precision/MRR, q236 nDCG, q237 AP) — each query above its
  * DuckDB oracle. Shared CTE text (bm25Cte, logregCtes, aucFoldSql)
  * stays in SparkEntry, `private[graft]`-imported, because q143/q147/
  * q149/q199 still compose it there (the TokenScriptRegistry
  * precedent). Bodies and SQL moved verbatim; the oracle gate re-ran
  * on the split — byte-identical results. */
private[graft] object EvalRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // inter-rater agreement (Quality.cohenKappa): the preference-data
    // QA metric — chance-corrected agreement in exact ppm fixed point;
    // raters synthesized from n_chars quintile labels with a planted
    // 1-in-7 disagreement class; the sign factors out of the final
    // division so `div`-vs-`//` negative semantics never meet
    "q181_cohen_kappa" -> ((s, d) => {
      val a = pmod(expr("n_chars div 50"), lit(5))
      val b = when(pmod(col("doc_id"), lit(7)) === 0, pmod(a + 1, lit(5)))
        .otherwise(a)
      Quality.cohenKappa(
        Tables.documents(s, d).select(a.as("ra"), b.as("rb")), "ra", "rb")
    }),
    // calibration report + ECE (Quality.calibrationReport, Naeini '15):
    // reliability of a model-confidence score before it gates a corpus
    // — hash-derived scores with labels drawn AT the score rate (well
    // calibrated in expectation) except the %13 class forced negative
    // (a planted overconfidence everywhere); integer ppm end to end,
    // the oracle replays both 48-bit hashes, buckets, and the
    // n-weighted ECE
    "q182_calibration" -> ((s, d) => {
      val score = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("cal"))), lit(1000001L))
      val label = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("lab"))), lit(1000000L)) < score
      val planted = when(pmod(col("doc_id"), lit(13)) === 0, lit(false))
        .otherwise(label)
      Quality.calibrationReport(
        Tables.documents(s, d).select(score.as("score_ppm"),
          planted.as("label")), "score_ppm", "label", 10)
    }),
    // ranked-retrieval evaluation (Retrieval.rankEval): recall@5 /
    // precision@5 / reciprocal rank in exact ppm over the q143 BM25
    // lists, against a planted qrels table (the query's source doc plus
    // its +1/+3 neighbors — partial recall by construction); queries
    // that retrieve nothing relevant surface with zeros, never vanish
    "q220_retrieval_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      val qrels = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          explode(array(col("doc_id"), col("doc_id") + 1,
            col("doc_id") + 3)).as("doc_id"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
      Retrieval.rankEval(Retrieval.bm25(docs, qs, k = 5), qrels, k = 5)
    }),
    // unbiased pass@4 (Chat.passAtK, Chen et al. '21 eq. 1): the
    // HumanEval estimator 1 - C(n-c,4)/C(n,4) in exact ppm over
    // 25-sample problems (passed = a deterministic length rule);
    // stepwise binomial products, decimal(38,0) for the scaled ratio
    "q223_pass_at_k" -> ((s, d) =>
      Chat.passAtK(Tables.documents(s, d)
        .select(expr("doc_id div 25").as("problem_id"),
          (coalesce(length(col("text")), lit(0)) % 3 === 0).as("passed")),
        k = 4)),
    // majority-vote self-consistency (Chat.majorityVote, Wang et al.
    // '22): 8 samples per problem, gold = 'a'||(pid%4), answers
    // hash-derived (even hash votes gold, odd spreads over 5 values,
    // %23 abstains with NULL); deterministic modal ties by
    // (count desc, answer asc)
    "q230_majority_vote" -> ((s, d) => {
      val pid = expr("doc_id div 8")
      val h = Kmv.hash48(concat(col("doc_id").cast("string"), lit("maj")))
      val gold = concat(lit("a"), pmod(pid, lit(4L)).cast("string"))
      val answer =
        when(pmod(col("doc_id"), lit(23)) === 0, lit(null).cast("string"))
          .when(pmod(h, lit(2L)) === 0, gold)
          .otherwise(concat(lit("a"), pmod(h, lit(5L)).cast("string")))
      Chat.majorityVote(Tables.documents(s, d).select(
        pid.as("problem_id"), answer.as("answer"), gold.as("gold")))
    }),
    // exact ROC-AUC of the q182 score/label synthesis (QualityModel
    // .rocAuc, the Mann-Whitney identity): grouped by score, ordered
    // alphabet running sum — no pair ever materializes; %13 forces
    // false labels, %17 NULLs the score (excluded, surfaced)
    "q231_roc_auc" -> ((s, d) => {
      val score = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("cal"))), lit(1000001L))
      val label = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("lab"))), lit(1000000L)) < score
      val planted = when(pmod(col("doc_id"), lit(13)) === 0, lit(false))
        .otherwise(label)
      val nulled = when(pmod(col("doc_id"), lit(17)) === 0,
        lit(null).cast("long")).otherwise(score)
      QualityModel.rocAuc(Tables.documents(s, d).select(
        nulled.as("score_ppm"), planted.as("label")))
    }),
    // trained-classifier AUC (QualityModel.rocAuc over the q199 head):
    // train the logistic quality head, score the corpus, then ask the
    // model-selection question q199 itself cannot answer — does the
    // learned score actually RANK positives above negatives? The
    // hard-sigmoid's 0/10^6 clamps collapse score ties across classes,
    // which is exactly what the tie half-credit term is for
    "q232_classifier_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = QualityModel.logregScore(docs,
        QualityModel.logregTrain(QualityModel.logregFrame(docs)))
      QualityModel.rocAuc(scored.select(col("p_ppm").as("score_ppm"),
        (col("y") === 1L).as("label")))
    }),
    // per-source ROC-AUC (QualityModel.rocAucBy): the q231 synthesis
    // partitioned by the source column — a classifier can rank well
    // globally while inverting inside one source; per-group fold,
    // same NULL/degenerate semantics
    "q234_auc_by_source" -> ((s, d) => {
      val score = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("cal"))), lit(1000001L))
      val label = pmod(Kmv.hash48(
        concat(col("doc_id").cast("string"), lit("lab"))), lit(1000000L)) < score
      val planted = when(pmod(col("doc_id"), lit(13)) === 0, lit(false))
        .otherwise(label)
      val nulled = when(pmod(col("doc_id"), lit(17)) === 0,
        lit(null).cast("long")).otherwise(score)
      QualityModel.rocAucBy(Tables.documents(s, d).select(col("source"),
        nulled.as("score_ppm"), planted.as("label")), "source")
    }),
    // scorer rank agreement (Stats.rankAgreement, Goodman-Kruskal
    // gamma): does the cheap Flesch heuristic rank documents the way
    // the trained q199 head does? Both scores quantized to the 16-level
    // grid (the q199 device) so the histogram theta join stays
    // alphabet-bounded; gamma over tau-b deliberately — no square root,
    // exact ppm
    "q235_score_agreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val fre = Quality.readability(docs)
        .where(col("fre_milli").isNotNull)
        .select(col("doc_id"),
          expr("least(greatest(fre_milli, 0) div 12500, 15)").as("x"))
      val head = QualityModel.logregScore(docs,
        QualityModel.logregTrain(QualityModel.logregFrame(docs)))
        .select(col("doc_id"), expr("least(p_ppm div 62500, 15)").as("y"))
      Stats.rankAgreement(fre.join(head, Seq("doc_id")))
    }),
    // nDCG@5 with graded relevance (Retrieval.ndcgAtK, Järvelin &
    // Kekäläinen '02): the q220 BM25 chain with GRADED qrels (source
    // doc gain 3, +1 gain 2, +3 gain 1) and the pinned integer
    // discount table — the position-sensitive metric the
    // recall/precision/MRR triple lacks
    "q236_ndcg" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      val qrels = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          explode(array(
            struct(col("doc_id").as("doc_id"), lit(3L).as("gain")),
            struct((col("doc_id") + 1).as("doc_id"), lit(2L).as("gain")),
            struct((col("doc_id") + 3).as("doc_id"), lit(1L).as("gain"))))
            .as("p"))
        .select(col("query_id"), col("p.doc_id").as("doc_id"),
          col("p.gain").as("gain"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
      Retrieval.ndcgAtK(Retrieval.bm25(docs, qs, k = 5), qrels, k = 5)
    }),
    // average precision at 5 (Retrieval.averagePrecision): the MAP
    // building block over the same q220 chain — per-term ppm flooring
    // documented; never-retrieved relevants stay in the denominator
    "q237_average_precision" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      val qrels = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          explode(array(col("doc_id"), col("doc_id") + 1,
            col("doc_id") + 3)).as("doc_id"))
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
      Retrieval.averagePrecision(Retrieval.bm25(docs, qs, k = 5), qrels, k = 5)
    }),
    // BM25 inverted-index retrieval (Retrieval.bm25): queries synthesized
    // in-plan (tokens 3..6 of every 100th doc), scored in exact
    // fixed-point integers (ratio idf in millionths, tf-weight in
    // thousandths, per-term floor THEN sum — float Σ is addition-order-
    // dependent across engines) over a real postings build; the oracle
    // replays tokenization, postings, global df/avgdl, both fixed-point
    // formulas, and the deterministic rank order
    "q143_bm25_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      Retrieval.bm25(docs, qs, k = 5)
    }),
    // hybrid retrieval with reciprocal-rank fusion (Retrieval.rrfFuse,
    // Cormack '09): the q143 BM25 ranks and the q27 brute-force cosine
    // ranks (same seed ids: every 100th doc/vector) fuse by exact
    // fixed-point 1e6 div (60 + rank) — RRF uses RANKS, so no
    // incommensurable-score arithmetic and no floats. The lexical side
    // includes the seed doc (it matches its own tokens); the vector
    // side excludes self (bruteForceKnn contract) — both deterministic,
    // both replayed by the oracle
    "q147_hybrid_rrf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val qsText = docs.where(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(filter(split(lower(col("text")), "\\s+"),
            t => length(t) > 0), 3, 4), " ").as("text"))
      val bm = Retrieval.bm25(docs, qsText, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val cos = Similarity.bruteForceKnn(
          emb.where(pmod(col("vec_id"), lit(100)) === 0), emb, k = 10)
        .select(col("qid").as("query_id"), col("nid").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(bm, cos), k = 10)
    }),
    // margin-based bitext mining (Similarity.bitextMargin, Artetxe &
    // Schwenk '19): ratio-margin alignment of a bounded source probe
    // set (evens < 120 plus 8 scaled twins of odd vectors — exact cos
    // 1.0 with their sources by the q28 IEEE power-of-two argument, so
    // the mined pairs provably contain the plants) against the odd
    // half; cosines quantize to milli-units first (the q30 device), so
    // neighborhood sums and the margin ratio replay as pure integer
    // arithmetic in DuckDB
    "q202_bitext_margin" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val x = emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 120)
        .select(col("vec_id"), col("embedding"))
        .unionByName(emb.where(col("vec_id") % 2 === 1 && col("vec_id") < 16)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            transform(col("embedding"), v => v * lit(2.0f)).as("embedding")))
      Similarity.bitextMargin(x, emb.where(col("vec_id") % 2 === 1), k = 4)
    }))

  val oracleSql: Map[String, String] = Map(
    "q181_cohen_kappa" ->
      """WITH r AS (SELECT CAST((n_chars // 50) % 5 AS VARCHAR) a,
        |    CAST(CASE WHEN doc_id % 7 = 0
        |      THEN ((n_chars // 50) % 5 + 1) % 5
        |      ELSE (n_chars // 50) % 5 END AS VARCHAR) b
        |  FROM documents),
        |tot AS (SELECT COUNT(*) n,
        |    COUNT(*) FILTER (WHERE a = b) agree FROM r),
        |na AS (SELECT a k, COUNT(*) na FROM r GROUP BY 1),
        |nb AS (SELECT b k, COUNT(*) nb FROM r GROUP BY 1),
        |pe AS (SELECT COALESCE(SUM(na * nb), 0) pe_num
        |       FROM na JOIN nb USING (k)),
        |f AS (SELECT CAST(n AS BIGINT) n_items,
        |    CAST((1000000 * agree) // n AS BIGINT) po_ppm,
        |    CAST((1000000 * pe_num) // (n * n) AS BIGINT) pe_ppm
        |  FROM tot CROSS JOIN pe)
        |SELECT n_items, po_ppm, pe_ppm,
        |  CAST(CASE WHEN 1000000 - pe_ppm = 0 THEN NULL
        |    ELSE (CASE WHEN po_ppm < pe_ppm THEN -1 ELSE 1 END)
        |      * ((1000000 * ABS(po_ppm - pe_ppm)) // (1000000 - pe_ppm))
        |    END AS BIGINT) kappa_ppm
        |FROM f""".stripMargin,
    "q182_calibration" ->
      """WITH hx AS (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || 'cal') hc,
        |    md5(CAST(doc_id AS VARCHAR) || 'lab') hl
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hc, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vc,
        |    CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hl, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vl
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id),
        |sl AS (SELECT doc_id, vc % 1000001 s,
        |    CASE WHEN doc_id % 13 = 0 THEN FALSE
        |         ELSE vl % 1000000 < vc % 1000001 END y
        |  FROM g),
        |b AS (SELECT LEAST((s * 10) // 1000000, 9) bucket, s,
        |    CASE WHEN y THEN 1 ELSE 0 END y FROM sl),
        |a AS (SELECT bucket, COUNT(*) n, SUM(s) ss, SUM(y) pos
        |      FROM b GROUP BY 1),
        |f AS (SELECT CAST(bucket AS BIGINT) bucket, CAST(n AS BIGINT) n,
        |    CAST(ss // n AS BIGINT) mean_score_ppm,
        |    CAST((1000000 * pos) // n AS BIGINT) pos_ppm FROM a),
        |gp AS (SELECT bucket, n, mean_score_ppm, pos_ppm,
        |    CAST(ABS(mean_score_ppm - pos_ppm) AS BIGINT) gap_ppm FROM f)
        |SELECT bucket, n, mean_score_ppm, pos_ppm, gap_ppm,
        |  CAST((SUM(n * gap_ppm) OVER ()) // (SUM(n) OVER ()) AS BIGINT)
        |    ece_ppm
        |FROM gp""".stripMargin,
    // retrieval-eval replay: the q143 BM25 chain cut to rk<=5, the
    // planted qrels (existing +0/+1/+3 docs), count/min rollups, and
    // the exact ppm metrics; zero-hit queries survive the left join
    "q220_retrieval_eval" ->
      ("WITH " + bm25Cte + """,
        |rk5 AS (SELECT query_id, doc_id, rk FROM r WHERE rk <= 5),
        |qr AS (SELECT query_id, rel FROM (
        |    SELECT doc_id query_id,
        |      unnest([doc_id, doc_id + 1, doc_id + 3]) rel
        |    FROM documents WHERE doc_id % 100 = 0)
        |  WHERE rel IN (SELECT doc_id FROM documents)),
        |nr AS (SELECT query_id, COUNT(*) n_rel FROM qr GROUP BY 1),
        |h AS (SELECT r5.query_id, COUNT(*) hh, MIN(rk) fr
        |  FROM rk5 r5 JOIN qr ON qr.query_id = r5.query_id
        |    AND qr.rel = r5.doc_id
        |  GROUP BY 1)
        |SELECT nr.query_id, CAST(n_rel AS BIGINT) n_rel,
        |  CAST(COALESCE(hh, 0) AS BIGINT) hits_at_k,
        |  CAST((1000000 * COALESCE(hh, 0)) // n_rel AS BIGINT) recall_ppm,
        |  CAST((1000000 * COALESCE(hh, 0)) // 5 AS BIGINT) precision_ppm,
        |  CAST(COALESCE(1000000 // fr, 0) AS BIGINT) rr_ppm
        |FROM nr LEFT JOIN h USING (query_id)""".stripMargin),
    // pass@4 replay: per-problem counts, the closed-form C(m,4) with
    // // 24 (exact for binomials; a zero factor sticks before any
    // negative one), the scaled ratio through HUGEINT, NULL when n < 4
    "q223_pass_at_k" ->
      """WITH s AS (SELECT doc_id // 25 problem_id,
        |    COALESCE(length(text), 0) % 3 = 0 passed FROM documents),
        |g AS (SELECT problem_id, COUNT(*) n,
        |    CAST(COUNT(*) FILTER (WHERE passed) AS BIGINT) c
        |  FROM s GROUP BY 1)
        |SELECT problem_id, CAST(n AS BIGINT) n_samples, c n_correct,
        |  CASE WHEN n >= 4 THEN CAST(1000000 - (1000000 * CAST(
        |      ((n-c) * (n-c-1) * (n-c-2) * (n-c-3)) // 24 AS HUGEINT))
        |    // ((n * (n-1) * (n-2) * (n-3)) // 24) AS BIGINT)
        |  END pass_at_k_ppm
        |FROM g""".stripMargin,
    // majority-vote replay: the hash48 digit-sum device, the same
    // answer synthesis, modal by row_number (count desc, answer asc),
    // the corpus accuracy as a window over the problem frame
    "q230_majority_vote" ->
      """WITH hx AS (SELECT doc_id, doc_id // 8 pid,
        |    md5(CAST(doc_id AS VARCHAR) || 'maj') h FROM documents),
        |g AS (SELECT doc_id, pid, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(h, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) v
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id, pid),
        |sm AS (SELECT pid, 'a' || CAST(pid % 4 AS VARCHAR) gold,
        |    CASE WHEN doc_id % 23 = 0 THEN NULL
        |         WHEN v % 2 = 0 THEN 'a' || CAST(pid % 4 AS VARCHAR)
        |         ELSE 'a' || CAST(v % 5 AS VARCHAR) END answer
        |  FROM g),
        |base AS (SELECT pid, CAST(COUNT(*) AS BIGINT) n_samples,
        |    MIN(gold) IS NOT DISTINCT FROM MAX(gold) gold_ok,
        |    MAX(gold) gld
        |  FROM sm GROUP BY 1),
        |v2 AS (SELECT pid, answer, COUNT(*) c FROM sm
        |  WHERE answer IS NOT NULL GROUP BY 1, 2),
        |md AS (SELECT pid, answer, CAST(c AS BIGINT) c,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY c DESC, answer ASC) rk,
        |    CAST(COUNT(*) OVER (PARTITION BY pid) AS BIGINT) nda
        |  FROM v2),
        |top AS (SELECT pid, answer modal_answer, c modal_count, nda
        |  FROM md WHERE rk = 1),
        |j AS (SELECT base.pid problem_id, n_samples, gold_ok,
        |    COALESCE(nda, 0) n_distinct_answers, modal_answer,
        |    COALESCE(modal_count, 0) modal_count,
        |    COALESCE(modal_answer = gld, FALSE) maj_correct
        |  FROM base LEFT JOIN top ON base.pid = top.pid)
        |SELECT problem_id, n_samples, gold_ok, n_distinct_answers,
        |  modal_answer, modal_count, maj_correct,
        |  CAST((1000000 * SUM(CASE WHEN maj_correct THEN 1 ELSE 0 END)
        |      OVER ()) // COUNT(*) OVER () AS BIGINT) maj_acc_ppm
        |FROM j""".stripMargin,
    // AUC replay: the q182 score/label synthesis with the %17 NULL
    // class, per-score pos/neg counts, the ascending running negative
    // sum, then the Mann-Whitney fold — all operands non-negative so
    // // == div; HUGEINT sums cast back to BIGINT
    "q231_roc_auc" ->
      ("""WITH hx AS (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || 'cal') hc,
        |    md5(CAST(doc_id AS VARCHAR) || 'lab') hl
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hc, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vc,
        |    CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hl, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vl
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id),
        |sl AS (SELECT CASE WHEN doc_id % 17 = 0 THEN NULL
        |      ELSE vc % 1000001 END s,
        |    CASE WHEN doc_id % 13 = 0 THEN FALSE
        |         ELSE vl % 1000000 < vc % 1000001 END y
        |  FROM g),""".stripMargin + "\n" + aucFoldSql),
    // classifier-AUC replay: the full q199 training chain (8 unrolled
    // GD rounds), the final-weight scoring expression as `sl`, then
    // the shared Mann-Whitney fold — no NULLs here, n_excluded 0
    "q232_classifier_auc" ->
      ("WITH " + logregCtes + """,
        |sl AS (SELECT CAST(least(greatest(
        |      (w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + 2000000) // 4,
        |      0), 1000000) AS BIGINT) s,
        |    f.y = 1 y
        |  FROM feat f CROSS JOIN wr8 w),""".stripMargin
        + "\n" + aucFoldSql),
    // per-source AUC replay: the q231 synthesis carrying source, the
    // fold partitioned/grouped by source
    "q234_auc_by_source" ->
      """WITH hx AS (SELECT doc_id, source,
        |    md5(CAST(doc_id AS VARCHAR) || 'cal') hc,
        |    md5(CAST(doc_id AS VARCHAR) || 'lab') hl
        |  FROM documents),
        |g AS (SELECT doc_id, source, CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hc, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vc,
        |    CAST(SUM(
        |      (strpos('0123456789abcdef', substr(hl, i, 1)) - 1)
        |      * CAST(power(16, 12 - i) AS BIGINT)) AS BIGINT) vl
        |  FROM hx CROSS JOIN generate_series(1, 12) t(i)
        |  GROUP BY doc_id, source),
        |sl AS (SELECT source, CASE WHEN doc_id % 17 = 0 THEN NULL
        |      ELSE vc % 1000001 END s,
        |    CASE WHEN doc_id % 13 = 0 THEN FALSE
        |         ELSE vl % 1000000 < vc % 1000001 END y
        |  FROM g),
        |gr AS (SELECT source, CASE WHEN s IS NULL OR y IS NULL THEN NULL
        |      ELSE s END s,
        |    SUM(CASE WHEN s IS NOT NULL AND y IS NOT NULL AND y
        |      THEN 1 ELSE 0 END) np,
        |    SUM(CASE WHEN s IS NOT NULL AND y IS NOT NULL AND NOT y
        |      THEN 1 ELSE 0 END) nn,
        |    SUM(CASE WHEN s IS NULL OR y IS NULL THEN 1 ELSE 0 END) nx
        |  FROM sl GROUP BY 1, 2),
        |acc AS (SELECT source, np, nn, nx,
        |    COALESCE(SUM(nn) OVER (PARTITION BY source
        |      ORDER BY s ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_nn
        |  FROM gr),
        |f AS (SELECT source, CAST(COALESCE(SUM(np), 0) AS BIGINT) n_pos,
        |    CAST(COALESCE(SUM(nn), 0) AS BIGINT) n_neg,
        |    CAST(COALESCE(SUM(nx), 0) AS BIGINT) n_excluded,
        |    CAST(COALESCE(SUM(np * cum_nn), 0) AS BIGINT) wins,
        |    CAST(COALESCE(SUM(np * nn), 0) AS BIGINT) AS "ties"
        |  FROM acc GROUP BY 1)
        |SELECT source, n_pos, n_neg, n_excluded, wins, "ties",
        |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    (1000000 * (2 * CAST(wins AS HUGEINT) + "ties"))
        |      // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT)
        |    auc_ppm
        |FROM f""".stripMargin,
    // rank-agreement replay: the raw-document readability chain, the
    // full q199 training chain, both banded to the 16-level grid, the
    // joint histogram, and the strict-inequality cell-pair fold;
    // gamma's one division sign-factored (C - D can be negative)
    "q235_score_agreement" ->
      ("""WITH rc AS (SELECT doc_id,
        |    CASE WHEN text IS NULL THEN 0
        |      ELSE len(list_filter(regexp_split_to_array(text, '\s+'),
        |        t2 -> t2 <> '')) END nw,
        |    CASE WHEN text IS NULL THEN 0
        |      ELSE greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      END ns,
        |    CASE WHEN text IS NULL THEN 0
        |      ELSE len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) END ny
        |  FROM documents),
        |fr AS (SELECT doc_id,
        |    CASE WHEN nw > 0 THEN 206835
        |      - (1015 * ((1000 * nw) // ns)) // 1000
        |      - (84600 * ((1000 * ny) // nw)) // 1000 END fre
        |  FROM rc),
        |xb AS (SELECT doc_id, least(greatest(fre, 0) // 12500, 15) x
        |  FROM fr WHERE fre IS NOT NULL),""".stripMargin
        + "\n" + logregCtes + """,
        |yb AS (SELECT f.doc_id, least(least(greatest(
        |      (w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + 2000000) // 4,
        |      0), 1000000) // 62500, 15) y
        |  FROM feat f CROSS JOIN wr8 w),
        |j AS (SELECT xb.x, yb.y FROM xb JOIN yb USING (doc_id)),
        |h AS (SELECT x, y, COUNT(*) n FROM j GROUP BY 1, 2),
        |pr AS (SELECT
        |    CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN a.n * b.n END), 0)
        |      AS BIGINT) concordant,
        |    CAST(COALESCE(SUM(CASE WHEN b.y < a.y THEN a.n * b.n END), 0)
        |      AS BIGINT) discordant
        |  FROM h a JOIN h b ON b.x > a.x AND b.y <> a.y),
        |tot AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) n_docs FROM h)
        |SELECT n_docs, concordant, discordant,
        |  CAST(CASE WHEN concordant + discordant > 0 THEN
        |    (CASE WHEN concordant < discordant THEN -1 ELSE 1 END) *
        |    ((1000000 * abs(concordant - discordant))
        |      // (concordant + discordant))
        |  END AS BIGINT) gamma_ppm
        |FROM tot CROSS JOIN pr""".stripMargin),
    // nDCG replay: the bm25 chain, graded qrels, the SAME pinned
    // discount VALUES (generated from one Scala formula on both
    // sides — no query-time float log anywhere), the ideal ranking by
    // row_number (gain desc, doc asc), HUGEINT at the final division
    "q236_ndcg" ->
      ("WITH " + bm25Cte + s""",
        |wt(pos, w) AS (VALUES ${Retrieval.ndcgWeightsSqlValues(5)}),"""
          .stripMargin + """
        |rk5 AS (SELECT query_id, doc_id, rk FROM r WHERE rk <= 5),
        |qr AS (SELECT query_id, rel, gain FROM (
        |    SELECT doc_id query_id,
        |      unnest([doc_id, doc_id + 1, doc_id + 3]) rel,
        |      unnest([3, 2, 1]) gain
        |    FROM documents WHERE doc_id % 100 = 0)
        |  WHERE rel IN (SELECT doc_id FROM documents)),
        |nr AS (SELECT query_id, COUNT(*) n_rel FROM qr GROUP BY 1),
        |dc AS (SELECT r5.query_id,
        |    CAST(SUM(CAST(qr.gain AS BIGINT) * wt.w) AS BIGINT) dcg
        |  FROM rk5 r5
        |    JOIN qr ON qr.query_id = r5.query_id AND qr.rel = r5.doc_id
        |    JOIN wt ON wt.pos = r5.rk
        |  GROUP BY 1),
        |idl AS (SELECT query_id,
        |    CAST(SUM(CAST(gain AS BIGINT) * w) AS BIGINT) idcg
        |  FROM (SELECT query_id, gain,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY gain DESC, rel ASC) rn
        |    FROM qr WHERE gain > 0) i
        |  JOIN wt ON wt.pos = i.rn
        |  WHERE rn <= 5 GROUP BY 1)
        |SELECT nr.query_id, CAST(n_rel AS BIGINT) n_rel,
        |  CAST(COALESCE(dcg, 0) AS BIGINT) dcg_fx,
        |  CAST(COALESCE(idcg, 0) AS BIGINT) idcg_fx,
        |  CAST(CASE WHEN COALESCE(idcg, 0) > 0 THEN
        |    (1000000 * CAST(COALESCE(dcg, 0) AS HUGEINT)) // idcg
        |  END AS BIGINT) ndcg_ppm
        |FROM nr LEFT JOIN idl USING (query_id)
        |  LEFT JOIN dc USING (query_id)""".stripMargin),
    // AP replay: the q220 chain + a running hit count over each
    // query's hits, per-term ppm flooring, the final div by n_rel
    "q237_average_precision" ->
      ("WITH " + bm25Cte + """,
        |rk5 AS (SELECT query_id, doc_id, rk FROM r WHERE rk <= 5),
        |qr AS (SELECT query_id, rel FROM (
        |    SELECT doc_id query_id,
        |      unnest([doc_id, doc_id + 1, doc_id + 3]) rel
        |    FROM documents WHERE doc_id % 100 = 0)
        |  WHERE rel IN (SELECT doc_id FROM documents)),
        |nr AS (SELECT query_id, COUNT(*) n_rel FROM qr GROUP BY 1),
        |h AS (SELECT r5.query_id, r5.rk,
        |    COUNT(*) OVER (PARTITION BY r5.query_id ORDER BY r5.rk) hthru
        |  FROM rk5 r5 JOIN qr ON qr.query_id = r5.query_id
        |    AND qr.rel = r5.doc_id),
        |a AS (SELECT query_id, COUNT(*) hits,
        |    CAST(SUM((1000000 * hthru) // rk) AS BIGINT) psum
        |  FROM h GROUP BY 1)
        |SELECT nr.query_id, CAST(n_rel AS BIGINT) n_rel,
        |  CAST(COALESCE(hits, 0) AS BIGINT) hits_at_k,
        |  CAST(COALESCE(psum, 0) // n_rel AS BIGINT) ap_ppm
        |FROM nr LEFT JOIN a USING (query_id)""".stripMargin),
    "q143_bm25_topk" ->
      ("WITH " + bm25Cte + """
        |SELECT query_id, CAST(rk AS BIGINT) rank, doc_id,
        |  CAST(score_fx AS BIGINT) score_fx
        |FROM r WHERE rk <= 5""".stripMargin),
    "q147_hybrid_rrf" ->
      ("WITH " + bm25Cte + """,
        |rb AS (SELECT query_id, doc_id, rk FROM r WHERE rk <= 10),
        |qv AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qvv
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |cv AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nvv
        |  FROM embeddings),
        |cs AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY list_cosine_similarity(qvv, nvv) DESC, nid ASC) rk
        |  FROM qv, cv WHERE qid != nid),
        |rc AS (SELECT qid query_id, nid doc_id, rk FROM cs WHERE rk <= 10),
        |u AS (SELECT query_id, doc_id, 1000000 // (60 + rk) c FROM rb
        |  UNION ALL SELECT query_id, doc_id, 1000000 // (60 + rk) FROM rc),
        |f AS (SELECT query_id, doc_id, SUM(c) rrf_fx FROM u GROUP BY 1, 2),
        |fr AS (SELECT query_id, doc_id, rrf_fx, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf_fx DESC, doc_id ASC) rk2
        |  FROM f)
        |SELECT query_id, CAST(rk2 AS BIGINT) rank, doc_id,
        |  CAST(rrf_fx AS BIGINT) rrf_fx
        |FROM fr WHERE rk2 <= 10""".stripMargin),
    // bitext margin replay: milli-quantized cosines, window top-k
    // neighborhood sums, integer ratio, best-per-source gate
    "q202_bitext_margin" ->
      """WITH x AS (SELECT vec_id xid, CAST(embedding AS DOUBLE[]) xv
        |    FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 120
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |      list_transform(CAST(embedding AS DOUBLE[]), v -> v * 2)
        |    FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 16),
        |y AS (SELECT vec_id yid, CAST(embedding AS DOUBLE[]) yv
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |c AS MATERIALIZED (SELECT xid, yid,
        |    CAST(FLOOR(list_cosine_similarity(xv, yv) * 1000 + 0.5)
        |      AS BIGINT) cm
        |  FROM x, y),
        |sx AS (SELECT xid, CAST(SUM(cm) AS BIGINT) s FROM (
        |    SELECT xid, cm, row_number() OVER (PARTITION BY xid
        |      ORDER BY cm DESC, yid ASC) r FROM c)
        |  WHERE r <= 4 GROUP BY xid),
        |sy AS (SELECT yid, CAST(SUM(cm) AS BIGINT) s FROM (
        |    SELECT yid, cm, row_number() OVER (PARTITION BY yid
        |      ORDER BY cm DESC, xid ASC) r FROM c)
        |  WHERE r <= 4 GROUP BY yid),
        |m AS (SELECT c.xid, c.yid, c.cm,
        |    (1000000 * 8 * c.cm) // greatest(sx.s + sy.s, 1) margin_ppm
        |  FROM c JOIN sx USING (xid) JOIN sy USING (yid)
        |  WHERE c.cm > 0),
        |b AS (SELECT *, row_number() OVER (PARTITION BY xid
        |    ORDER BY margin_ppm DESC, yid ASC) rb FROM m)
        |SELECT xid, yid, cm c_mill, margin_ppm
        |FROM b WHERE rb = 1 AND margin_ppm >= 1000000""".stripMargin)
}
