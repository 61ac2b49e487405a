package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * Such queries fall back to a deterministic global entry sample,
    * the `beam` lowest-id corpus nodes (stable across runs,
    * partitionings and cluster sizes — the repo's tie-break rule), and
    * the normal beam walk proceeds from there. Queries WITH bucket
    * mates are untouched, so in-distribution results cannot change.
    * The sample is a TakeOrdered over the id column only (column-
    * pruned; the persisted-index path keeps a prebuilt sample next to
    * its meta so no full scan happens per search). */
  private def entryFallback(routed: DataFrame, qids: DataFrame,
                            nids: DataFrame, beam: Int): DataFrame = {
    val lonely = broadcast(
      qids.join(routed.select("qid"), Seq("qid"), "left_anti"))
    val seeds = nids.select(col("nid")).orderBy(col("nid").asc).limit(beam)
    routed.unionByName(
      lonely.crossJoin(seeds).where(col("qid") =!= col("nid"))
        .select("qid", "nid"))
  }

  /** Batched beam search over a prebuilt graph. Returns
    * `(qid, nid, rank, sim)`, `rank <= k`.
    *
    * `entries` pins the per-query entry set (`(qid, nid)` rows —
    * index resume, cross-shard search, or a traversal certificate);
    * `None` routes each query to its LSH bucket-mates, scored and
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
                 allowed: Option[DataFrame] = None,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && beam >= k && hops >= 0 && planes >= 0)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    def score(cand: DataFrame): DataFrame =
      cand.join(c, "nid").join(broadcast(q), "qid")
        .select(col("qid"), col("nid"), cos(col("qv"), col("nv")).as("sim"))
    def trim(scored: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      scored.withColumn("_rn", row_number().over(w))
        .where(col("_rn") <= n).drop("_rn")
    }
    val entry0 = entries match {
      case Some(e) => e.select(col("qid"), col("nid"))
      case None =>
        val qb = broadcast(q.withColumn("bucket",
          bucketOf(col("qv"), planes)).select("qid", "bucket"))
        val routed = c.withColumn("bucket", bucketOf(col("nv"), planes))
          .join(qb, Seq("bucket"))
          .where(col("qid") =!= col("nid"))
          .select("qid", "nid")
        // q, not qb: qb carries a broadcast hint, which a left-anti
        // join cannot honor on its left side (warn noise)
        entryFallback(routed, q.select("qid"), c.select("nid"), beam)
    }
    val beam0 = trim(score(entry0.dropDuplicates("qid", "nid")), beam)
    val fin = (0 until hops).foldLeft(beam0) { (bm, _) =>
      val expand = bm.select("qid", "nid")
        .join(edges.select(col("src").as("nid"), col("dst")), "nid")
        .select(col("qid"), col("dst").as("nid"))
        .where(col("qid") =!= col("nid"))
        .dropDuplicates("qid", "nid")
        .join(bm.select("qid", "nid"), Seq("qid", "nid"), "left_anti")
      trim(bm.unionByName(score(expand)), beam)
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
    * discipline carried to the graph family):
    *
    *   - `path/meta` — one row `(planes, degree, tables)`; search and
    *     append read it so the three sides can never disagree on the
    *     hash geometry.
    *   - `path/vectors` — `(nid, nvec, b0)` partitioned by
    *     `vb = b0 mod 256`, the BOUNDED bucket-group: entry routing
    *     and append select by `(vb, b0)`, so partition pruning cuts
    *     255/256 of the store and the row-group b0 min/max (files are
    *     sorted by b0 within each group) prunes the rest. Partitioning
    *     by raw `b0` — one directory per bucket — was the round-16
    *     smoke finding: planes sizes to log2(n)-4, so a 100k corpus
    *     already meant 8k directories (build 188 s, a 16-probe search
    *     63 s, all file-metadata bound) and a 1B corpus would need
    *     67M — a fixed 256-way group keeps directory counts flat at
    *     ANY corpus size (measured at 100k: build 188 -> 25 s, a
    *     16-probe search 63 -> 7 s, compaction 199 -> 8 s).
    *   - `path/edges` — `(src, dst, sim)` partitioned by
    *     `shard = pmod(src, 64)`: appends touch only the shards their
    *     sources hash to.
    *   - `path/entrysample` — the 64 lowest-id `(nid)` rows: the
    *     routing fallback for a query whose `b0` bucket is empty (see
    *     [[entryFallback]]) reads this tiny sidecar instead of
    *     scan-sampling billions of vector rows per search batch. Any
    *     fixed node set is a valid entry set, so appends never need to
    *     refresh it; [[compactGraphIndex]] does anyway.
    */
  /** Directory fan-out of the vector store — fixed, so metadata cost
    * never scales with `planes` (doc above). */
  private val VbGroups = 256L

  private def withVb(df: DataFrame): DataFrame =
    df.withColumn("vb", pmod(col("b0"), lit(VbGroups)).cast("int"))

  def buildGraphIndex(corpus: DataFrame, path: String, degree: Int = 8,
                      planes: Int = 6, maxBucket: Int = 512,
                      refineRounds: Int = 1, tables: Int = 2,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((planes, degree, tables)).toDF("planes", "degree", "tables")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    withVb(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        bucketOf(col(vecCol), planes).as("b0")))
      .repartition(col("vb"))
      .sortWithinPartitions(col("vb"), col("b0"))
      .write.mode("overwrite").partitionBy("vb").parquet(s"$path/vectors")
    writeEntrySample(spark, path)
    knnGraph(corpus, degree, planes, maxBucket, refineRounds, tables,
        idCol, vecCol)
      .withColumn("shard", pmod(col("src"), lit(64L)).cast("int"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/edges")
  }

  private def writeEntrySample(spark: org.apache.spark.sql.SparkSession,
                               path: String): Unit =
    spark.read.parquet(s"$path/vectors")
      .select(col("nid")).orderBy(col("nid").asc).limit(64)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/entrysample")

  private def loadMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Int]("planes"), r.getAs[Int]("degree"), r.getAs[Int]("tables"))
  }

  /** Incremental insert — the HNSW-insert analog, LSM-style: new nodes
    * link to their table-0 bucket-mates (existing AND same-batch), and
    * each touched mate gains back-edges to its best new arrivals, all
    * as APPENDED files. Old edge files are never rewritten, so a mate's
    * effective degree drifts up by at most `degree` per append until
    * [[compactGraphIndex]] re-trims — breadth cost during search,
    * never a correctness one. Per-batch reads: the batch, the meta
    * row, and ONLY the touched bucket-group vector directories.
    *
    * Id contract (r15 advice, stated plainly): index ids are
    * IMMUTABLE. Re-appending an (id, vector) pair identical to one
    * already present is safe (replay — readers dedupe), but appending
    * an EXISTING id with DIFFERENT contents is an update this LSM has
    * no version column to resolve; readers then keep the survivor
    * with the lexicographically smallest vector ([[searchGraphIndex]]
    * / [[compactGraphIndex]]) — deterministic, but NOT last-write-wins.
    * Route updates through delete + rebuild, not append. */
  def appendToGraphIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val (planes, degree, _) = loadMeta(spark, path)
    val bv = withVb(batch.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      bucketOf(col(vecCol), planes).as("b0")))
    // existing mates: the broadcast (vb, b0) join prunes the vectors
    // scan to the batch's bucket-group directories (vb is the
    // partition column; b0 then prunes row groups).
    // dropDuplicates: a previously replayed append may have duplicated
    // a mate row; scoring it twice would waste degree slots in the trim
    val mates = spark.read.parquet(s"$path/vectors")
      .join(broadcast(bv.select(col("vb"), col("b0")).distinct()),
        Seq("vb", "b0"))
      .dropDuplicates("nid")
    val newToOld = bv.as("b").join(mates.as("m"), Seq("b0"))
      .select(col("b.nid").as("src"), col("m.nid").as("dst"),
        cos(col("b.nvec"), col("m.nvec")).as("sim"))
    val newToNew = bv.as("x").join(bv.as("y"),
        col("x.b0") === col("y.b0") && col("x.nid") =!= col("y.nid"))
      .select(col("x.nid").as("src"), col("y.nid").as("dst"),
        cos(col("x.nvec"), col("y.nvec")).as("sim"))
    val fwd = trimEdges(newToOld.unionByName(newToNew), degree)
    // back-edges: each touched mate links to its best new arrivals
    val back = trimEdges(newToOld.select(col("dst").as("src"),
      col("src").as("dst"), col("sim")), degree)
    fwd.unionByName(back)
      .withColumn("shard", pmod(col("src"), lit(64L)).cast("int"))
      .write.mode("append").partitionBy("shard").parquet(s"$path/edges")
    bv.write.mode("append").partitionBy("vb").parquet(s"$path/vectors")
  }

  /** Search a persisted graph index: entry candidates come from the
    * query's `(vb, b0)` bucket group (pruned scan, zero bucket
    * recompute on the corpus side), then [[beamSearch]] walks the
    * stored edges.
    * Appended duplicates of an (src, dst) edge are harmless — the
    * frontier dedupes per hop. A query whose `b0` bucket is empty
    * enters at the index's persisted `entrysample` nodes instead
    * of returning zero rows (the [[entryFallback]] recall floor,
    * without scanning the vector store). */
  def searchGraphIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int = 5, beam: Int = 16,
                       hops: Int = 2, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val (planes, _, _) = loadMeta(spark, path)
    // a replayed append (see StreamVectorIngest) can land the same
    // (nid, nvec) row twice — and a contract-violating id reuse can
    // land two DIFFERENT vectors under one id. One deterministic
    // survivor per id: the lexicographically smallest vector (min over
    // the array ordering — partial-aggregable, unlike a window), so a
    // duplicated unique nearest neighbour can never occupy two top-k
    // ranks and results are stable across partitionings (r15 advice:
    // dropDuplicates picked an arbitrary row).
    val corpus = spark.read.parquet(s"$path/vectors")
      .groupBy(col("nid")).agg(min(col("nvec")).as("nvec"))
      .select(col("nid").as(idCol), col("nvec").as(vecCol))
    // beamSearch walks (src, dst) only — it re-scores every frontier
    // against the query, so stored sims never need to load
    val edges = spark.read.parquet(s"$path/edges").select("src", "dst")
    val qb = broadcast(withVb(queries.select(col(idCol).as("qid"),
      bucketOf(col(vecCol), planes).as("b0"))))
    val routed = spark.read.parquet(s"$path/vectors")
      .join(qb, Seq("vb", "b0"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
    val entries = entryFallback(routed,
      queries.select(col(idCol).as("qid")), entrySample(spark, path), beam)
    beamSearch(queries, corpus, edges, Some(entries), k, beam, hops, planes,
      idCol = idCol, vecCol = vecCol)
  }

  /** The persisted routing-fallback sample; an index written before the
    * sidecar existed falls back to the id-ordered head of the vector
    * store (same rows, one column-pruned TakeOrdered). */
  private def entrySample(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$path/entrysample")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(s"$path/entrysample")
    else spark.read.parquet(s"$path/vectors")
      .select(col("nid")).orderBy(col("nid").asc).limit(64)
  }

  /** Re-trim a persisted index to its meta `degree` — the compaction
    * [[appendToGraphIndex]]'s LSM discipline defers to. Folds every
    * replayed (src, dst) edge duplicate (copies carry the same
    * deterministic sim), re-trims each source to `degree` under the
    * `(sim desc, dst asc)` order, dedupes vector rows to the one
    * deterministic survivor per id [[searchGraphIndex]] already
    * resolves at read time (so compaction can never change what
    * search sees), and refreshes the entry sample. Both frames are
    * materialized via eager local checkpoint BEFORE the overwrite
    * touches their source directories — the [[graft.streaming.Ledger]]
    * writeCompacted rule. Ownership: run offline, like
    * [[buildGraphIndex]] — the directory overwrite is job-commit
    * atomic, not concurrent-reader safe. */
  def compactGraphIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit = {
    val (planes, degree, _) = loadMeta(spark, path)
    val vecs = withVb(spark.read.parquet(s"$path/vectors")
        .groupBy(col("nid")).agg(min(col("nvec")).as("nvec"))
        .select(col("nid"), col("nvec"),
          bucketOf(col("nvec"), planes).as("b0")))
      .repartition(col("vb"))
      .sortWithinPartitions(col("vb"), col("b0"))
      .localCheckpoint(true)
    val edges = trimEdges(
        spark.read.parquet(s"$path/edges")
          .select(col("src"), col("dst"), col("sim"))
          .dropDuplicates("src", "dst"),
        degree)
      .withColumn("shard", pmod(col("src"), lit(64L)).cast("int"))
      .localCheckpoint(true)
    edges.write.mode("overwrite").partitionBy("shard").parquet(s"$path/edges")
    vecs.write.mode("overwrite").partitionBy("vb").parquet(s"$path/vectors")
    writeEntrySample(spark, path)
  }
}
