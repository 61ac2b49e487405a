package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{QualityModel, Retrieval, Similarity}

/** Vector/ANN domain registry (round-15 split tranche 2): the
  * embedding-table search family — exact kNN (q27/q87/q121), the
  * planted-probe ANN certificates (q28 LSH, q36 IVF, q104/q105/q108
  * IVF-PQ, q122 BQ), embedding near-dup + SemDeDup (q30/q93), the
  * learned linear probe (q146), late-interaction MaxSim (q218) and
  * the Matryoshka recall audit (q225) — each query directly above its
  * DuckDB oracle. Bodies and SQL moved verbatim from SparkEntry;
  * results are byte-identical (the gate re-ran on the split).
  * The graph-ANN family (q261/q262) lives in [[GraphAnnRegistry]]. */
private[graft] object VectorRegistry {

  private def top1Certificate(approx: DataFrame, offset: Long): DataFrame =
    approx.where(col("rank") === 1)
      .select(col("qid"), (col("nid") === col("qid") - offset).as("top1_ok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_knn_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceKnn(emb.where(col("vec_id") < 5), emb, k = 5)
    }),
    // Planted-probe certificate (round-3): the testdata embeddings are
    // near-orthogonal, so "LSH recall@k vs exact" is not a stable
    // invariant (true neighbors of a random vector land in other buckets
    // with probability ~1-2^-planes). What IS deterministic: a query that
    // is exactly 2*v has bit-identical hyperplane signs (power-of-two
    // scaling is exact in IEEE arithmetic) and cosine 1.0 with its source,
    // so its top-1 MUST be the source vector — certifying bucketing,
    // candidate generation, cosine ranking and the window top-k end to
    // end. Source ids are the corpus minimum, so even an exact-tie
    // resolves to them under the nid-asc tie-break.
    "q28_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      top1Certificate(Similarity.lshKnn(probes, emb, k = 5, planes = 6), 1000000L)
    }),
    "q30_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairsExact(Tables.embeddings(s, d).where(col("vec_id") < 200), minCos = 0.35)),
    // Planted-probe certificate (round-3), like q28 but with an IDENTICAL
    // copy of the source vector (L2 quantizer assignment is not scale-
    // invariant, so the 2x trick doesn't apply): the probe's nearest list
    // IS its source's list, so nprobe>=1 guarantees the source is a
    // candidate and cosine 1.0 makes it top-1. The quantizer fits on a
    // bounded sample clustered locally — no per-iteration Spark jobs.
    "q36_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = Similarity.fitCentroids(emb, nlist = 8, maxIter = 5)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      top1Certificate(Similarity.ivfKnn(probes, emb, centroids, k = 5, nprobe = 3), 1000000L)
    }),
    // IVF-PQ: coarse lists prune the corpus, ADC over 8-byte codes ranks
    // the survivors (~30x less index data than raw floats at 100 TB).
    // Certificate: a probe that IS a corpus vector must come back AT the
    // minimal ADC distance — its own codes minimize the ADC sum per
    // construction (not strict rank 1: a planted near-twin can quantize
    // to identical codes and tie). A false row means encoder/LUT/scorer
    // disagree (see Similarity.pqKnn doc)
    "q104_ivfpq_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = Similarity.fitCentroids(emb, nlist = 8, maxIter = 5)
      val books = Similarity.pqTrain(emb, m = 8, ksub = 16)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      Similarity.ivfPqKnn(probes, emb, centroids, books, k = 5, nprobe = 3)
        .groupBy(col("qid")).agg(
          min(col("adist")).as("_mn"),
          min(when(col("nid") === col("qid") - 1000000L, col("adist"))).as("_self"))
        .select(col("qid"),
          (col("_self").isNotNull && col("_self") === col("_mn")).as("top1_ok"))
    }),
    // IVF-PQ shortlist + exact re-rank — the two-stage production search.
    // Full-precision cosine breaks every ADC tie, so an exact-copy probe
    // is STRICT top-1 (cos = 1), the same certificate q36 pins for
    // IVF-Flat; a false row means the shortlist lost the true neighbor
    // or the re-rank scored it wrong
    "q105_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = Similarity.fitCentroids(emb, nlist = 8, maxIter = 5)
      val books = Similarity.pqTrain(emb, m = 8, ksub = 16)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      val shortlist = Similarity.ivfPqKnn(probes, emb, centroids, books,
        k = 20, nprobe = 3)
      top1Certificate(
        Similarity.rerankExact(shortlist, probes, emb, k = 5), 1000000L)
    }),
    // residual IVF-PQ (the full FAISS IVFPQ recipe): codes trained on
    // vec - nearest-centroid, per-(query,list) LUTs. nprobe=1 keeps the
    // certificate PROVABLE — within the query's own list its residual
    // codes are the per-subspace LUT argmin, so self shares the minimal
    // ADC distance; at nprobe>1 other lists' LUTs make that only
    // statistically true
    "q108_ivfpq_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = Similarity.fitCentroids(emb, nlist = 8, maxIter = 5)
      val books = Similarity.pqTrainResidual(emb, centroids, m = 8, ksub = 16)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      Similarity.ivfPqKnnResidual(probes, emb, centroids, books, k = 5, nprobe = 1)
        .groupBy(col("qid")).agg(
          min(col("adist")).as("_mn"),
          min(when(col("nid") === col("qid") - 1000000L, col("adist"))).as("_self"))
        .select(col("qid"),
          (col("_self").isNotNull && col("_self") === col("_mn")).as("top1_ok"))
    }),
    // filtered ANN: top-k restricted to a metadata predicate (the "search
    // within label" query every vector store serves) — the filter lands
    // on the corpus scan, so selective predicates SHRINK the work
    "q87_filtered_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceKnn(emb.where(col("vec_id") < 5),
        emb.where(col("label") % 4 === 1), k = 5)
    }),
    // certificate (q28 discipline): a 2x-scaled copy keeps every sign
    // bit, so Hamming 0 forces the source into the shortlist and exact
    // rescoring must return it as top-1
    "q122_bq_rescore" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.where(col("vec_id") < 5).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Similarity.bqKnn(probes, emb, k = 5)
        .where(col("rank") === 1)
        .select(col("qid"), (col("nid") === col("qid") - 1000000L).as("top1_ok"))
    }),
    // Matryoshka truncated-dim retrieval (Similarity.truncateDims +
    // bruteForceKnn): exact top-k on the 16-dim prefix — cosine is
    // scale-invariant so no renormalization; the oracle slices the same
    // prefix
    "q121_truncated_knn" -> ((s, d) => {
      val emb = Similarity.truncateDims(Tables.embeddings(s, d), dims = 16)
      Similarity.bruteForceKnn(emb.where(col("vec_id") < 5), emb, k = 5)
    }),
    // embedding linear probe (QualityModel.embeddingProbe*, the
    // DataComp-style learned quality head over vectors): diagonal
    // least-squares weights in exact fixed-point over QUANTIZED
    // components (float dot products are rounding/order-dependent;
    // integer ones are not), supervision synthesized in-plan from a
    // known linear direction (sign of the first two quantized dims on
    // every 5th vector), scoring scan-side with the weight vector
    // in-plan (QuantDot). Sign extracted before division: Spark `div`
    // truncates, DuckDB `//` floors — magnitudes divide identically
    "q146_embedding_probe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      def q(j: Int): Column =
        floor(col("embedding").getItem(j).cast("double") * 1024.0 + 0.5).cast("long")
      val labeled = emb.where(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("embedding"),
          when(q(0) + q(1) > 0, 1L).otherwise(-1L).as("y"))
      val w = QualityModel.embeddingProbeWeights(labeled, dim = 64)
      QualityModel.embeddingProbeScore(emb, w)
    }),
    // late-interaction MaxSim retrieval (Retrieval.maxSim, ColBERT's
    // scoring rule): multi-vector docs (4 chunk vectors per doc from
    // the embeddings table), query tokens as scaled chunk copies so
    // each probe's source doc carries a planted exact-match answer;
    // milli-quantized cosines before max/sum (q189 flag stability),
    // two-stage suspects-only (recall gate 150 milli, then exact
    // MaxSim over candidates)
    "q218_maxsim" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val chunks = emb.select(expr("vec_id div 4").as("doc_id"),
        col("embedding"))
      val qs = emb
        .where(col("vec_id").isin(20L, 22L, 68L, 70L, 92L, 94L, 126L))
        .select(expr("vec_id div 4").as("qid"), (col("vec_id") % 4).as("qtok"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Retrieval.maxSim(chunks, qs, k = 5, minCosMilli = 150L)
    }),
    // Matryoshka truncation-recall audit (rankEval over the two exact
    // retrievers, the Kusupati '22 evaluation): ranked = q121's
    // 16-dim-prefix top-5, qrels = the FULL-dim brute-force top-5
    // ground truth — recall@5 / RR measure exactly what retrieval
    // quality the first 16 dims keep; the self-eval composition every
    // ANN deployment runs before trusting a cheaper tier
    "q225_matryoshka_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val t16 = Similarity.truncateDims(emb, dims = 16)
      val ranked = Similarity
        .bruteForceKnn(t16.where(col("vec_id") < 8), t16, k = 5)
        .select(col("qid").as("query_id"), col("rank"),
          col("nid").as("doc_id"))
      val qrels = Similarity
        .bruteForceKnn(emb.where(col("vec_id") < 8), emb, k = 5)
        .select(col("qid").as("query_id"), col("nid").as("doc_id"))
      Retrieval.rankEval(ranked, qrels, k = 5)
    }),
    // SemDeDup planted-twin certificate: every 10th vector gets an
    // identical-embedding twin at vec_id+1e6; within-cluster cosine 1
    // kills exactly the twins (identical vectors always co-cluster), so
    // the survivors are precisely the original corpus — same planted-
    // certificate discipline as q25/q30
    "q93_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val twins = emb.where(col("vec_id") % 10 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      Similarity.semDedup(emb.unionByName(twins), nlist = 16)
        .select(col("vec_id"))
    }),
    // quantizer-drift monitor (Similarity.assignmentDrift, the r17
    // "rebuild when assignment distances creep" trigger made a
    // watchable number): frozen centroids stand in as the 4 lowest-id
    // embeddings (deterministic, SQL-replayable — a real deployment
    // passes the index's own centroid sidecar via ivfDriftStats),
    // batches keyed vec_id mod 8 as ingest-window stand-ins.
    // Milli-quantized distances + integer ppm mean + DISCRETE p90, so
    // both engines aggregate identical integers
    "q265_ivf_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.where(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
      Similarity.assignmentDrift(emb, cents, pmod(col("vec_id"), lit(8)).as("batch"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q27_knn_cosine" ->
      """WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nv FROM embeddings),
        |s AS (SELECT qid, nid, list_cosine_similarity(qv, nv) sim FROM q, c WHERE qid != nid),
        |r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) rank FROM s)
        |SELECT qid, nid, rank FROM r WHERE rank <= 5""".stripMargin,
    "q28_ann_lsh" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q30_embed_neardup" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) ve
        |           FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id vec_a, b.vec_id vec_b,
        |  FLOOR(list_cosine_similarity(a.ve, b.ve) * 1000 + 0.5) / 1000.0 cos
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.ve, b.ve) >= 0.35""".stripMargin,
    "q36_ann_ivf" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q104_ivfpq_knn" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q105_pq_rerank" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q108_ivfpq_residual" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q122_bq_rescore" ->
      "SELECT vec_id + 1000000 qid, TRUE top1_ok FROM embeddings WHERE vec_id < 5",
    "q146_embedding_probe" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT)) q
        |  FROM embeddings),
        |lab AS (SELECT q, CASE WHEN q[1] + q[2] > 0 THEN 1 ELSE -1 END y
        |  FROM e WHERE vec_id % 5 = 0),
        |ld AS (SELECT j, SUM(q[j] * y) num, SUM(q[j] * q[j]) den
        |  FROM lab, range(1, 65) t(j) GROUP BY j),
        |w AS (SELECT j, CASE WHEN num >= 0
        |    THEN (num * 1000000) // GREATEST(den, 1)
        |    ELSE -((-num * 1000000) // GREATEST(den, 1)) END w
        |  FROM ld),
        |sc AS (SELECT e.vec_id, SUM(w.w * e.q[w.j]) s FROM e, w
        |  GROUP BY e.vec_id)
        |SELECT vec_id, CAST(s AS BIGINT) score_fx, s > 0 keep FROM sc""".stripMargin,
    "q121_truncated_knn" ->
      """WITH q AS (SELECT vec_id qid, CAST(embedding[1:16] AS DOUBLE[]) qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id nid, CAST(embedding[1:16] AS DOUBLE[]) nv FROM embeddings),
        |s AS (SELECT qid, nid, list_cosine_similarity(qv, nv) sim
        |      FROM q, c WHERE qid != nid),
        |r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |        ORDER BY sim DESC, nid ASC) rank FROM s)
        |SELECT qid, nid, rank FROM r WHERE rank <= 5""".stripMargin,
    "q87_filtered_knn" ->
      """WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nv FROM embeddings WHERE label % 4 = 1),
        |s AS (SELECT qid, nid, list_cosine_similarity(qv, nv) sim FROM q, c WHERE qid != nid),
        |r AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) rank FROM s)
        |SELECT qid, nid, rank FROM r WHERE rank <= 5""".stripMargin,
    // the planted twins (and ONLY they) are dropped, so the survivor set
    // is the original corpus verbatim
    "q93_semdedup" -> "SELECT vec_id FROM embeddings",
    // drift replay: same milli-quantization before any aggregate, `//`
    // floor division == Spark's `div` on these nonnegative integers,
    // discrete p90 at rank ceil(0.9 n) = (9n + 9) // 10
    "q265_ivf_drift" ->
      """WITH c AS (SELECT CAST(embedding AS DOUBLE[]) cv
        |  FROM embeddings WHERE vec_id < 4),
        |d AS (SELECT e.vec_id % 8 batch,
        |    CAST(FLOOR((1 - MAX(list_cosine_similarity(
        |      CAST(e.embedding AS DOUBLE[]), c.cv))) * 1000 + 0.5)
        |      AS BIGINT) d_milli
        |  FROM embeddings e, c GROUP BY e.vec_id),
        |a AS (SELECT batch, COUNT(*) n_vecs, SUM(d_milli) s,
        |    MAX(d_milli) max_milli FROM d GROUP BY 1),
        |r AS (SELECT batch, d_milli, row_number() OVER (
        |    PARTITION BY batch ORDER BY d_milli ASC) rn FROM d),
        |p AS (SELECT r.batch, r.d_milli p90_milli
        |  FROM r JOIN a USING (batch) WHERE rn = (9 * n_vecs + 9) // 10)
        |SELECT a.batch, CAST(n_vecs AS BIGINT) n_vecs,
        |  CAST((s * 1000) // n_vecs AS BIGINT) mean_ppm,
        |  p90_milli, CAST(max_milli AS BIGINT) max_milli
        |FROM a JOIN p USING (batch)""".stripMargin,
    // Matryoshka-recall replay: both exact retrievers as q27-style
    // CTEs (prefix-sliced and full), then the q220 metric rollups
    "q225_matryoshka_recall" ->
      """WITH q16 AS (SELECT vec_id qid, CAST(embedding[1:16] AS DOUBLE[]) qv
        |  FROM embeddings WHERE vec_id < 8),
        |c16 AS (SELECT vec_id nid, CAST(embedding[1:16] AS DOUBLE[]) nv
        |  FROM embeddings),
        |s16 AS (SELECT qid, nid, list_cosine_similarity(qv, nv) sim
        |  FROM q16, c16 WHERE qid != nid),
        |r16 AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, nid ASC) rk FROM s16),
        |qf AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
        |  FROM embeddings WHERE vec_id < 8),
        |cf AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) nv
        |  FROM embeddings),
        |sf AS (SELECT qid, nid, list_cosine_similarity(qv, nv) sim
        |  FROM qf, cf WHERE qid != nid),
        |rf AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, nid ASC) rk FROM sf),
        |qr AS (SELECT qid query_id, nid rel FROM rf WHERE rk <= 5),
        |nr AS (SELECT query_id, COUNT(*) n_rel FROM qr GROUP BY 1),
        |h AS (SELECT r.qid query_id, COUNT(*) hh, MIN(r.rk) fr
        |  FROM r16 r JOIN qr ON qr.query_id = r.qid AND qr.rel = r.nid
        |  WHERE r.rk <= 5 GROUP BY 1)
        |SELECT nr.query_id, CAST(n_rel AS BIGINT) n_rel,
        |  CAST(COALESCE(hh, 0) AS BIGINT) hits_at_k,
        |  CAST((1000000 * COALESCE(hh, 0)) // n_rel AS BIGINT) recall_ppm,
        |  CAST((1000000 * COALESCE(hh, 0)) // 5 AS BIGINT) precision_ppm,
        |  CAST(COALESCE(1000000 // fr, 0) AS BIGINT) rr_ppm
        |FROM nr LEFT JOIN h USING (query_id)""".stripMargin,
    // MaxSim replay: chunk/query synthesis, milli-cosines, the recall
    // gate, per-(qid,doc,qtok) max over ALL candidate chunks, per-doc
    // sum, (score desc, doc asc) top-k window
    "q218_maxsim" ->
      """WITH c AS (SELECT vec_id // 4 doc_id,
        |    CAST(embedding AS DOUBLE[]) cv FROM embeddings),
        |q AS (SELECT vec_id // 4 qid, vec_id % 4 qtok,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) qv
        |  FROM embeddings WHERE vec_id IN (20, 22, 68, 70, 92, 94, 126)),
        |s AS (SELECT qid, qtok, doc_id,
        |    CAST(FLOOR(list_cosine_similarity(qv, cv) * 1000 + 0.5)
        |      AS BIGINT) cm
        |  FROM q, c),
        |cand AS (SELECT DISTINCT qid, doc_id FROM s WHERE cm >= 150),
        |mx AS (SELECT s.qid, s.doc_id, s.qtok, MAX(cm) m
        |  FROM s JOIN cand USING (qid, doc_id) GROUP BY 1, 2, 3),
        |sc AS (SELECT qid, doc_id, CAST(SUM(m) AS BIGINT) maxsim_milli
        |  FROM mx GROUP BY 1, 2)
        |SELECT qid, CAST(rn AS BIGINT) rank, doc_id, maxsim_milli FROM (
        |  SELECT qid, doc_id, maxsim_milli, row_number() OVER (
        |      PARTITION BY qid ORDER BY maxsim_milli DESC, doc_id ASC) rn
        |  FROM sc) WHERE rn <= 5""".stripMargin)
}
