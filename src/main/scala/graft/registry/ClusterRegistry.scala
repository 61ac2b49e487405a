package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry.waterfillCtes
import graft.model.Tables
import graft.ops.Similarity

/** Clustering/PCA domain registry (round-15 split tranche 5): seeded
  * k-means (q207) and k-center (q224) with the per-cluster report
  * (q208) and balanced coreset (q211), plus the power-iteration PCA
  * pair (q206 projection, q212 anisotropy) — each query above its
  * DuckDB oracle. The replay helpers (kmeansCtesWith, kcenterInitSql,
  * pcaCtes) move WITH the family — no other oracle composes them;
  * waterfillCtes stays in SparkEntry (q210 composes it too) and is
  * private[graft]-imported, the TokenScriptRegistry precedent.
  * Bodies and SQL moved verbatim; the oracle gate re-ran on the
  * split — byte-identical results. */
private[graft] object ClusterRegistry {

  /** PCA power-iteration replay (q206): milli-quantized elements,
    * truncated-integer-mean centering (sign-factored |S| div n — the
    * n-scaled form would grow Gram entries as n³), the d×d Gram via a
    * vec_id self-join, then 8 unrolled MATERIALIZED (w, v) round pairs
    * with infinity-norm normalization to 2^20 (sign-factored division —
    * BigInt `/` on the Spark driver truncates; on the nonneg operands
    * both engines floor). v0 routes through HUGEINT so every product
    * up the chain stays exact. */
  private val pcaCtes: String = {
    val iterCtes = (1 to 8).map { t =>
      val p = t - 1
      s"""w$t AS MATERIALIZED (SELECT gj j, SUM(gv * vv) w
         |  FROM g JOIN v$p ON g.gk = v$p.j GROUP BY 1),
         |v$t AS MATERIALIZED (SELECT j,
         |  (CASE WHEN w < 0 THEN -1 ELSE 1 END) *
         |    ((abs(w) * 1048576) // (SELECT MAX(abs(w)) FROM w$t)) vv
         |  FROM w$t)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) l FROM embeddings),
       |nq AS MATERIALIZED (SELECT COUNT(*) n FROM e),
       |m AS MATERIALIZED (SELECT vec_id, generate_subscripts(l, 1) j,
       |    CAST(floor(unnest(l) * 1000 + 0.5) AS BIGINT) mv FROM e),
       |s AS MATERIALIZED (SELECT j, CAST(SUM(mv) AS BIGINT) sj
       |  FROM m GROUP BY j),
       |mu AS (SELECT j, CAST((CASE WHEN sj < 0 THEN -1 ELSE 1 END) *
       |    (abs(sj) // (SELECT n FROM nq)) AS BIGINT) muj FROM s),
       |c AS MATERIALIZED (SELECT vec_id, m.j,
       |    mv - muj AS cv FROM m JOIN mu USING (j)),
       |g AS MATERIALIZED (SELECT a.j gj, b.j gk, SUM(a.cv * b.cv) gv
       |  FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2),
       |v0 AS (SELECT j, CAST(1048576 AS HUGEINT) vv FROM s),
       |$iterCtes""".stripMargin
  }

  /** k-means replay (q207): milli-quantized elements, init = the k
    * lowest-id rows with cid = id rank, then `rounds` unrolled
    * MATERIALIZED (distance, assignment, update) CTE triples. The
    * update is a LEFT join from the previous centroid frame so empty
    * clusters COALESCE to their previous centroid — the exact
    * kmeansClusters rule. Divisions run on abs() with the sign
    * reapplied (div/floor parity). */
  /** The Lloyd-round replay (q207/q224) with a pluggable `init`
    * (vec_id, cid) CTE — seeding differs, the iteration body never
    * does. */
  private def kmeansCtesWith(initSql: String): String = {
    val iterCtes = (1 to 4).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (SELECT m.vec_id, c.cid,
         |    SUM((m.mv - c.cv) * (m.mv - c.cv)) d2
         |  FROM m JOIN c$p c USING (j) GROUP BY 1, 2),
         |a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
         |    FROM d$t) WHERE rn = 1),
         |u$t AS (SELECT a.cid, m.j, SUM(m.mv) sv, COUNT(*) cnt
         |  FROM a$t a JOIN m USING (vec_id) GROUP BY 1, 2),
         |c$t AS MATERIALIZED (SELECT p.cid, p.j,
         |    COALESCE((CASE WHEN u.sv < 0 THEN -1 ELSE 1 END) *
         |      (abs(u.sv) // u.cnt), p.cv) cv
         |  FROM c$p p LEFT JOIN u$t u ON p.cid = u.cid AND p.j = u.j)"""
        .stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) l FROM embeddings),
       |m AS MATERIALIZED (SELECT vec_id, generate_subscripts(l, 1) j,
       |    CAST(floor(unnest(l) * 1000 + 0.5) AS BIGINT) mv FROM e),
       |$initSql,
       |c0 AS MATERIALIZED (SELECT init.cid, m.j, m.mv cv
       |  FROM init JOIN m USING (vec_id)),
       |$iterCtes""".stripMargin
  }

  private val kmeansCtes: String = kmeansCtesWith(
    """init AS (SELECT vec_id,
      |    row_number() OVER (ORDER BY vec_id) - 1 cid
      |  FROM e ORDER BY vec_id LIMIT 4)""".stripMargin)

  /** Farthest-point seeding replay (q224): seed1 = lowest id; each
    * later seed = argmax of the running min d² (LEAST-folded), ties to
    * the lowest id — exactly [[graft.ops.Similarity]]'s kcenterSeeds. */
  private val kcenterInitSql: String = {
    val k = 4
    def distTo(seed: String): String =
      s"""(SELECT m.vec_id, SUM((m.mv - c.mv) * (m.mv - c.mv)) d2
         |   FROM m JOIN m c ON c.j = m.j
         |     AND c.vec_id = (SELECT vec_id FROM $seed)
         |   GROUP BY 1)""".stripMargin
    val rounds = (2 to k).map { j =>
      val nd =
        if (j == 2)
          s"""nd1 AS MATERIALIZED (SELECT x.vec_id, x.d2
             |  FROM ${distTo("seed1")} x)""".stripMargin
        else
          s"""nd${j - 1} AS MATERIALIZED (SELECT p.vec_id,
             |    LEAST(p.d2, n.d2) d2
             |  FROM nd${j - 2} p JOIN ${distTo(s"seed${j - 1}")} n
             |    USING (vec_id))""".stripMargin
      s"""$nd,
         |seed$j AS MATERIALIZED (SELECT vec_id FROM nd${j - 1}
         |  ORDER BY d2 DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val initUnion = (1 to k)
      .map(j => s"SELECT vec_id, ${j - 1} cid FROM seed$j")
      .mkString("\n|  UNION ALL ")
    s"""seed1 AS MATERIALIZED (SELECT vec_id FROM e ORDER BY vec_id LIMIT 1),
       |$rounds,
       |init AS ($initUnion)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top principal component by power iteration (Similarity
    // .pcaProjection, Mu & Viswanath '18 anisotropy probe): elements
    // milli-quantized (q30 device), centering by the TRUNCATED integer
    // mean (c = m − sdiv(S, n) — n-scaled centering grows the Gram as
    // n³), the 64×64 Gram in ONE corpus pass via a
    // map-side-combined triangle Aggregator, 8 driver-side BigInt
    // power rounds with INFINITY-norm normalization to 2^20 (an L2
    // norm would need an exact sqrt past 2^52 — max/div replay
    // verbatim), projections back as a lazy zero-shuffle scan; the
    // oracle unrolls the same 8 rounds as MATERIALIZED CTEs over a
    // vec_id self-join Gram
    "q206_pca_projection" -> ((s, d) =>
      Similarity.pcaProjection(Tables.embeddings(s, d))),
    // distributed Lloyd's k-means (Similarity.kmeansClusters, the
    // SemDeDup clustering step, Abbas et al. '23): init = k lowest-id
    // rows, argmin assignment via packed d²·k+cid tie keys (ties to
    // the lowest cid), sign-factored integer centroid means, empty
    // clusters keep their centroid; 4 rounds, each ONE corpus scan
    // with centroids as broadcast literals, only k·d-row updates
    // collected; the oracle unrolls the rounds as MATERIALIZED
    // assignment/update CTE pairs
    "q207_kmeans_clusters" -> ((s, d) =>
      Similarity.kmeansClusters(Tables.embeddings(s, d))),
    // per-cluster quality report (Similarity.clusterReport): member
    // count, inertia (the elbow statistic), the SemDeDup prototype
    // (nearest-to-centroid member, ties to lowest id — packed
    // dist²·2^24 + id min keys), and the radius; one map-side-combined
    // groupBy over the q207 assignment
    "q208_cluster_report" -> ((s, d) =>
      Similarity.clusterReport(
        Similarity.kmeansClusters(Tables.embeddings(s, d)))),
    // cluster-balanced coreset with waterfilled budgets (Similarity
    // .clusterCoreset): the selection read the clustering exists for —
    // q210's exact waterfill over the q207 cluster SIZES sets each
    // cluster's member quota, then prototype-first picks (nearest to
    // centroid, ties to lowest id) within a cluster-PARTITIONED window
    "q211_cluster_coreset" -> ((s, d) =>
      Similarity.clusterCoreset(Tables.embeddings(s, d))),
    // anisotropy report (Similarity.pcaAnisotropy): the Mu & Viswanath
    // single-number read — dominant-component variance share as
    // (1e6·vᵀGv) div (vᵀv·tr G), every operand an exact integer from
    // the SAME fit q206 uses (BigInt driver / HUGEINT oracle); no
    // additional corpus scan beyond the fit
    "q212_pca_anisotropy" -> ((s, d) =>
      Similarity.pcaAnisotropy(Tables.embeddings(s, d))),
    // farthest-point-seeded k-means (Similarity.kmeansClustersKcenter,
    // Gonzalez '85 k-center traversal — the deterministic sibling of
    // kmeans++, whose D² sampling has no exact integer replay): seed1
    // = lowest id, each later seed = argmax running min-d² (ties to
    // lowest id; the KmeansKey kernel supplies min-d² in one scan),
    // then the SAME Lloyd rounds as q207; the oracle swaps only the
    // init CTE under the shared kmeansCtesWith body
    "q224_kmeans_kcenter" -> ((s, d) =>
      Similarity.kmeansClustersKcenter(Tables.embeddings(s, d))))

  val oracleSql: Map[String, String] = Map(
    // PCA replay: quantize, scale-center, Gram self-join, 8 unrolled
    // power rounds (see pcaCtes), project with the round-8 component
    "q206_pca_projection" ->
      (s"WITH $pcaCtes" + """
        |SELECT c.vec_id, CAST(SUM(cv * vv) AS BIGINT) proj
        |FROM c JOIN v8 USING (j) GROUP BY c.vec_id""".stripMargin),
    // k-means replay: init from the k lowest ids, 4 unrolled Lloyd
    // rounds (see kmeansCtes), final assignment under c4
    "q207_kmeans_clusters" ->
      (s"WITH $kmeansCtes," + """
        |fin AS (SELECT m.vec_id, c.cid, SUM((m.mv - c.cv) * (m.mv - c.cv)) d2
        |  FROM m JOIN c4 c USING (j) GROUP BY 1, 2)
        |SELECT vec_id, CAST(cid AS BIGINT) AS "cluster", CAST(d2 AS BIGINT) dist2
        |FROM (SELECT vec_id, cid, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |  FROM fin) WHERE rn = 1""".stripMargin),
    // cluster-report replay: the q207 assignment + one rollup with
    // packed min keys for the prototype argmin
    "q208_cluster_report" ->
      (s"WITH $kmeansCtes," + """
        |fin AS (SELECT m.vec_id, c.cid, SUM((m.mv - c.cv) * (m.mv - c.cv)) d2
        |  FROM m JOIN c4 c USING (j) GROUP BY 1, 2),
        |asg AS (SELECT vec_id, cid, CAST(d2 AS BIGINT) d2
        |  FROM (SELECT vec_id, cid, d2,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |    FROM fin) WHERE rn = 1)
        |SELECT CAST(cid AS BIGINT) AS "cluster", COUNT(*) n_members,
        |  CAST(SUM(d2) AS BIGINT) inertia,
        |  CAST(MIN(d2 * 16777216 + vec_id) % 16777216 AS BIGINT) proto_id,
        |  CAST(MIN(d2 * 16777216 + vec_id) // 16777216 AS BIGINT) proto_dist2,
        |  MAX(d2) radius
        |FROM asg GROUP BY cid""".stripMargin),
    // coreset replay: the q207 assignment CTEs + cluster sizes through
    // the shared waterfill chain + prototype-first window picks
    "q211_cluster_coreset" ->
      (s"WITH $kmeansCtes," + """
        |fin AS (SELECT m.vec_id, c.cid, SUM((m.mv - c.cv) * (m.mv - c.cv)) d2
        |  FROM m JOIN c4 c USING (j) GROUP BY 1, 2),
        |asg AS (SELECT vec_id, CAST(cid AS BIGINT) cid, CAST(d2 AS BIGINT) d2
        |  FROM (SELECT vec_id, cid, d2,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |    FROM fin) WHERE rn = 1),
        |av AS (SELECT cid source, COUNT(*) avail FROM asg GROUP BY 1),
        |""".stripMargin + waterfillCtes(500000L) + """,
        |ranked AS (SELECT vec_id, cid, d2,
        |    CAST(row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id)
        |      - 1 AS BIGINT) pick_rank
        |  FROM asg)
        |SELECT r.vec_id, r.cid AS "cluster", r.d2 dist2, r.pick_rank
        |FROM ranked r JOIN alloc a ON r.cid = a.source
        |WHERE r.pick_rank < a.alloc_tokens""".stripMargin),
    // anisotropy replay: the q206 chain + Rayleigh/trace arithmetic
    "q212_pca_anisotropy" ->
      (s"WITH $pcaCtes," + """
        |ray AS (SELECT SUM(va.vv * g.gv * vb.vv) vgv FROM g
        |  JOIN v8 va ON g.gj = va.j JOIN v8 vb ON g.gk = vb.j),
        |nrm AS (SELECT SUM(vv * vv) vtv FROM v8),
        |tr AS (SELECT SUM(gv) trace FROM g WHERE gj = gk)
        |SELECT (SELECT n FROM nq) n_vectors,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s) dim,
        |  CAST(trace AS BIGINT) trace,
        |  CAST(CASE WHEN vtv = 0 OR trace = 0 THEN NULL
        |    ELSE (1000000 * vgv) // (vtv * trace) END AS BIGINT)
        |    anisotropy_ppm
        |FROM ray CROSS JOIN nrm CROSS JOIN tr""".stripMargin),
    // k-center replay: the farthest-point seed CTEs swap in as `init`,
    // everything after is the q207 Lloyd body verbatim
    "q224_kmeans_kcenter" ->
      (s"WITH ${kmeansCtesWith(kcenterInitSql)}," + """
        |fin AS (SELECT m.vec_id, c.cid, SUM((m.mv - c.cv) * (m.mv - c.cv)) d2
        |  FROM m JOIN c4 c USING (j) GROUP BY 1, 2)
        |SELECT vec_id, CAST(cid AS BIGINT) AS "cluster", CAST(d2 AS BIGINT) dist2
        |FROM (SELECT vec_id, cid, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
        |  FROM fin) WHERE rn = 1""".stripMargin))
}
