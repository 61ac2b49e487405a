package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - brute-force cosine top-k — the exact baseline. Queries are a small
  *    broadcast side; the corpus streams once; per-query top-k is a
  *    window-ranked aggregation (the cross product is |corpus| x |queries|,
  *    linear in the corpus for a fixed query batch).
  *  - hyperplane LSH (Charikar '02 random projections): each vector hashes
  *    to a `planes`-bit bucket; search joins query buckets to corpus
  *    buckets — the scan becomes an equi-join on bucket, sub-linear in
  *    practice, recall tuned by planes count and multi-probe.
  *
  * The cosine / bucket kernels are codegen'd Catalyst expressions
  * (graft.expr.{CosineSim, HyperplaneBucket}) — round 1 used interpreted
  * `zip_with`/`aggregate` HOFs (~6*dim interpreted evals per pair) and a
  * driver-blocking `.first()` to learn the vector dimension; both are gone
  * (the expression reads the dimension from each row's own array, so empty
  * inputs and ragged dims are handled instead of throwing).
  */
object Similarity {

  /** Per-group embedding centroids, flat (group, dim, value) output — the
    * mean-pool a dataset-cartography / class-prototype pass computes over
    * billions of vectors. Shape: posexplode to (group, dim, component),
    * ONE groupBy(group, dim) — shuffle rows are 3 scalars each, partial
    * aggregation map-side, no vector ever materializes on a single
    * reducer. Float addition is order-dependent, so components are scaled
    * to exact integers (floor(v*1e6+0.5)) before summing — integer sums
    * are associative, making the mean bit-identical on any engine and any
    * partitioning; the scaled mean is emitted floor-rounded to 6dp. */
  def groupCentroids(vectors: DataFrame, groupCol: String,
                     vecCol: String = "embedding"): DataFrame =
    vectors
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(groupCol), (col("dim") + 1).cast("long").as("dim"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("sv"))
      .groupBy(col(groupCol), col("dim"))
      .agg(sum(col("sv")).as("s"), count(lit(1)).as("n"))
      .select(col(groupCol), col("dim"),
        (floor(col("s").cast("double") / col("n") + 0.5) / 1000000.0).as("centroid"))

  /** Symmetric int8 quantization of an embedding column — the
    * storage/bandwidth-compression step an ANN index runs before sharding
    * (4× smaller vectors, SIMD-friendly integer dot products). Per vector:
    * scale s = max|x| / 127, codes cᵢ = round(xᵢ/s) ∈ [-127, 127]; an
    * all-zero vector quantizes to zero codes. Scan-speed column math, no
    * shuffle, no UDF.
    *
    * The max|x| is materialized as an ATTRIBUTE behind a Generate barrier
    * before the per-element lambda divides by it: a lambda capturing the
    * `array_max(transform(...))` EXPRESSION would re-reduce the whole
    * vector per element — O(d²) per row, the q73 bug class in arithmetic
    * form (invisible to LambdaCostAudit, which pins parser/regex work).
    *
    * Cross-engine determinism: floats cast to double before any
    * arithmetic (exact widening), one IEEE division per element, round()
    * half-away-from-zero in both engines; the emitted scale is
    * fixed-point (×1e9, floor+0.5) so the frame hash-matches DuckDB. */
  def quantizeInt8(embeddings: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val embD = transform(col(vecCol), x => x.cast("double"))
    val barrier = embeddings.select(col(idCol), inline(array(struct(
      embD.as("e"),
      array_max(transform(embD, x => abs(x))).as("m")))))
    barrier.select(
      col(idCol),
      floor(col("m") / 127.0 * 1e9 + 0.5).cast("long").as("scale_e9"),
      when(col("m") === 0.0, transform(col("e"), _ => lit(0)))
        .otherwise(transform(col("e"),
          x => round(x / (col("m") / 127.0), 0).cast("int"))).as("codes"))
  }

  /** Cosine similarity, null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = Exprs.cosineSim(a, b)

  /** Matryoshka-style dimension truncation (Kusupati et al. 2022): keep
    * the first `dims` components. MRL-trained embeddings concentrate
    * information in the prefix, so retrieval on the truncated prefix is
    * the standard cheap first pass (dims/d of the bytes and FLOPs; at
    * 100 TB of vectors that is the difference between a hot and a cold
    * index tier). NO renormalization is needed for cosine retrieval —
    * cosine is scale-invariant, so rankings on the truncated vectors are
    * identical with or without the norm step; compose with
    * [[bruteForceKnn]]/[[ivfKnn]] unchanged (q121). */
  def truncateDims(df: DataFrame, dims: Int,
                   vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, "dims must be positive")
    df.withColumn(vecCol, slice(col(vecCol), 1, dims))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` and `corpus` both need (`idCol`, `vecCol`); self-matches
    * (same id) are excluded. Output: (qid, nid, rank). */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = c.join(q, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** Binary-quantized retrieval with exact rescoring (the BQ + rescore
    * pattern of modern vector stores): corpus vectors collapse to ONE
    * long each via [[graft.expr.Exprs.bqPack]] (sign bit per dim, 32×
    * smaller than float32), the shortlist stage ranks by
    * `bit_count(qbq ^ nbq)` — an XOR + POPCNT per candidate over 8-byte
    * keys instead of 256-byte float arrays, which is why the scan tier
    * of a 100 TB vector corpus can stay hot — and only the top
    * `shortlist` candidates per query are rescored with exact cosine on
    * the full vectors (a broadcast-shortlist equi-join back to the
    * corpus, the q105 re-rank discipline).
    *
    * Hamming ties are broken by id, so the shortlist is deterministic;
    * positive scaling preserves all sign bits, so an exact- or
    * scaled-copy probe has Hamming 0 to its source and MUST surface it
    * (q122's planted-probe certificate). Output: (qid, nid, rank) by
    * exact cosine over the shortlist. */
  def bqKnn(queries: DataFrame, corpus: DataFrame, k: Int = 5,
            shortlist: Int = 20, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      col(vecCol).as("qvec"), Exprs.bqPack(col(vecCol)).as("qbq")))
    val c = corpus.select(col(idCol).as("nid"), Exprs.bqPack(col(vecCol)).as("nbq"))
    val wH = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc, col("nid").asc)
    val short = c.join(q.select(col("qid"), col("qbq")), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        bit_count(col("qbq").bitwiseXOR(col("nbq"))).as("hamming"))
      .withColumn("_hr", row_number().over(wH))
      .where(col("_hr") <= shortlist)
    val wC = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    short
      .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), Seq("nid"))
      .join(q.select(col("qid"), col("qvec")), Seq("qid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** Exact near-duplicate pairs over a (SMALL) vector set: all pairs with
    * cosine >= minCos, similarity emitted floor-rounded to 3 decimals
    * (engine-independent rounding — see ops/Relational round2 note). The
    * quadratic all-pairs form is the oracle ground truth; the scale path
    * is Dedup.embeddingDuplicates (hyperplane-LSH candidates + exact
    * verify). */
  def nearDupPairsExact(embeddings: DataFrame, minCos: Double = 0.35,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("vec_a"), col("r.id").as("vec_b"),
        cosine(col("l.v"), col("r.v")).as("c"))
      .where(col("c") >= minCos)
      .select(col("vec_a"), col("vec_b"), (floor(col("c") * 1000 + 0.5) / 1000.0).as("cos"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL 2019 — the ratio-margin criterion behind CCMatrix/LASER
    * mining): a source-side sentence x is aligned to the target-side y
    * maximizing
    *
    *   margin(x, y) = cos(x, y) / ( avg_{z∈NNk(x,Y)} cos(x, z)/2
    *                              + avg_{z∈NNk(y,X)} cos(y, z)/2 )
    *
    * — the cosine NORMALIZED by both sides' neighborhood density, which
    * kills the hubness failure of raw-cosine alignment (a "hub" target
    * near everything has a dense neighborhood, so its margin deflates).
    *
    * Engine-exact form: cosines quantize to milli-units FIRST
    * (floor(c·1000 + 0.5), the q30 3dp device — both engines compute
    * the identical integer), so neighborhood sums and the margin ratio
    * are pure integer arithmetic: margin_ppm = (10⁶·2k·c) div
    * max(sx + sy, 1) with sx/sy the top-k milli-cosine sums. Candidates
    * with non-positive cosine are dropped BEFORE the ratio (never
    * bitext, and it keeps the dividend non-negative — floor ==
    * truncate); the max() keeps the divisor positive even when a
    * neighborhood sum goes negative. Per x, the single best y by
    * (margin desc, id asc) survives the `minMarginPpm` gate —
    * 10⁶ = "above its neighborhoods' average" (CCMatrix ships ~1.06).
    *
    * Shape at scale: the SOURCE side is the bounded probe set (the
    * [[bruteForceKnn]] broadcast discipline — it ships to every
    * executor), the target side streams once; both top-k windows
    * partition by one id over the |X|·|Y| candidate frame. Full-corpus
    * mining swaps the cartesian candidate stage for [[lshKnn]] buckets
    * per side, scoring the SAME margin over the union of both
    * directions' candidates. */
  def bitextMargin(src: DataFrame, tgt: DataFrame, k: Int = 4,
                   minMarginPpm: Long = 1000000L,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1)
    val x = broadcast(src.select(col(idCol).as("xid"), col(vecCol).as("xvec")))
    val c = tgt.select(col(idCol).as("yid"), col(vecCol).as("yvec"))
      .join(x)
      .select(col("xid"), col("yid"),
        floor(cosine(col("xvec"), col("yvec")) * 1000 + 0.5).cast("long").as("cm"))
      .persist() // feeds both neighborhood sums and the candidate gate
    val wx = Window.partitionBy(col("xid")).orderBy(col("cm").desc, col("yid").asc)
    val wy = Window.partitionBy(col("yid")).orderBy(col("cm").desc, col("xid").asc)
    val sx = c.withColumn("_r", row_number().over(wx)).where(col("_r") <= k)
      .groupBy(col("xid")).agg(sum(col("cm")).as("_sx"))
    val sy = c.withColumn("_r", row_number().over(wy)).where(col("_r") <= k)
      .groupBy(col("yid")).agg(sum(col("cm")).as("_sy"))
    val m = c.where(col("cm") > 0L)
      .join(broadcast(sx), Seq("xid"))
      .join(sy, Seq("yid"))
      .withColumn("margin_ppm",
        expr(s"(1000000 * ${2 * k} * cm) div greatest(_sx + _sy, 1)"))
    val wb = Window.partitionBy(col("xid"))
      .orderBy(col("margin_ppm").desc, col("yid").asc)
    val out = m.withColumn("_rb", row_number().over(wb))
      .where(col("_rb") === 1 && col("margin_ppm") >= minMarginPpm)
      .select(col("xid"), col("yid"), col("cm").as("c_mill"), col("margin_ppm"))
    // Materialize before returning so the |X|·|Y| candidate cache can be
    // released here — a lazy return would pin `c` in the CacheManager for
    // the life of the session (the winnowPairs lifecycle rule).
    Dedup.materializeAndRelease(out, c)
  }

  /** SemDeDup-style semantic near-duplicate removal (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings with the same bounded-
    * sample coarse quantizer IVF uses ([[fitCentroids]]), then compare
    * pairs ONLY within a cluster and drop every vector that has a
    * lower-id clustermate with cosine >= tau. The cluster pass turns the
    * O(n²) all-pairs matrix into Σ|cluster|² — with k clusters of ~n/k
    * that is n²/k, and k scales with corpus size at constant cluster
    * width (SemDeDup ran 50k clusters over LAION-440M). Everything after
    * training is two narrow projections + ONE equi-join on cluster_id:
    * assignment is a codegen'd per-row expression (no shuffle), the join
    * shuffles both sides by cluster once, and survivors come back via a
    * half-join on id.
    *
    * Near-dup pairs that straddle a cluster boundary are MISSED — that is
    * SemDeDup's documented recall trade-off (its published dedup keeps
    * within-cluster pairs only), not an implementation shortcut; raise
    * recall with more Lloyd iterations or run [[Dedup.embeddingDuplicates]]
    * (LSH-bucketed) when cross-boundary recall matters more than cost.
    *
    * Skew: k-means clusters are data-sized, so a degenerate corpus (many
    * identical vectors) can concentrate one cluster. `maxPairsPerCluster`
    * fails loudly past the bound instead of silently running an n² stage —
    * the same explicit-cap discipline as Dedup's LSH buckets. */
  def semDedup(embeddings: DataFrame, nlist: Int = 16, tau: Double = 0.99,
               idCol: String = "vec_id", vecCol: String = "embedding",
               seed: Long = 42L,
               maxPairsPerCluster: Long = 100000000L): DataFrame = {
    val cents = fitCentroids(embeddings, nlist, vecCol, seed).map(_.toSeq).toSeq
    // Assignment (nearestCentroids per row) feeds the guard and BOTH join
    // sides — materialize it once (eager localCheckpoint, GC-managed)
    // instead of scanning + re-assigning the corpus three times.
    val v = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cl", Exprs.nearestCentroids(col("v"), cents, 1).getItem(0))
      .transform(graft.plans.CheckpointAudit.local)
    val worst = v.groupBy(col("cl")).agg(count(lit(1)).as("n"))
      .agg(max(col("n") * (col("n") - 1)).cast("long")).head().getLong(0) / 2
    require(worst <= maxPairsPerCluster,
      s"semDedup: largest cluster implies $worst candidate pairs " +
        s"(> $maxPairsPerCluster); raise nlist or pre-shard the corpus")
    val dropped = v.as("l").join(v.as("r"),
        col("l.cl") === col("r.cl") && col("l.id") < col("r.id"))
      .where(cosine(col("l.v"), col("r.v")) >= tau)
      .select(col("r.id").as(idCol)).distinct()
    embeddings.join(dropped, Seq(idCol), "left_anti")
  }

  /** `planes`-bit LSH bucket of a vector: bit p = sign(v . plane_p).
    * Deterministic pseudo-random hyperplanes derived per (plane, component)
    * from an integer mix — reproducible across sessions with zero data
    * movement; dimension read from the row (no driver action). */
  def lshBucket(vec: Column, planes: Int): Column =
    Exprs.hyperplaneBucket(vec, planes)

  /** Attach an LSH bucket column (named `bucket`) to a vector table. */
  def withBucket(df: DataFrame, vecCol: String, planes: Int = 12): DataFrame =
    df.withColumn("bucket", lshBucket(col(vecCol), planes))

  // ------------------------------------------------------------------ IVF

  /** Train the IVF coarse quantizer on a BOUNDED sample of the corpus —
    * the FAISS discipline (max_points_per_centroid=256): quantizer quality
    * saturates at a few hundred training points per centroid, so the
    * training set is `samplePerList * nlist` rows at ANY corpus size. The
    * sample (not the data — a few MB even when the corpus is 100 TB) is
    * collected and clustered locally with seeded k-means++/Lloyd's: zero
    * Spark jobs per iteration. Round 2 ran spark.ml KMeans over the full
    * corpus — a multi-pass distributed fit whose 5 jobs were the slowest
    * query in the bench, and which at 100 TB would scan everything
    * `maxIter` times. Deterministic via fixed seed. */
  def fitCentroids(corpus: DataFrame, nlist: Int, vecCol: String = "embedding",
                   seed: Long = 42L, maxIter: Int = 10,
                   samplePerList: Int = 256,
                   knownCount: Option[Long] = None): Array[Array[Double]] = {
    val target = samplePerList.toLong * nlist
    // count is metadata-only for a plain parquet scan but a full action on
    // filtered/derived inputs — callers that already know the size (or
    // train several quantizers on one corpus, like buildIvfPqIndex) pass
    // it in so the corpus is scanned once per trainer, not twice
    val n = knownCount.getOrElse(corpus.count())
    val sampled =
      if (n <= target) corpus
      else corpus.sample(withReplacement = false,
        fraction = math.min(1.0, target.toDouble * 1.05 / n), seed)
    val pts = sampled.select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray).filter(_.nonEmpty)
    require(pts.nonEmpty, "fitCentroids: no non-empty vectors to train on")
    kmeansLocal(pts, nlist, seed, maxIter)
  }

  /** Seeded k-means++ init + Lloyd's iterations over an in-memory sample.
    * Plain deterministic math — no RDDs; the sample is bounded by design. */
  private def kmeansLocal(pts: Array[Array[Double]], k: Int,
                          seed: Long, maxIter: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val dim = pts(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding (D^2 weighting); duplicates are tolerated when the
    // sample has fewer distinct points than k (their lists just stay empty)
    val cents = new Array[Array[Double]](k)
    cents(0) = pts(rnd.nextInt(pts.length)).clone()
    val minD = pts.map(p => d2(p, cents(0)))
    var c = 1
    while (c < k) {
      val total = minD.sum
      var pick = if (total > 0) rnd.nextDouble() * total else 0.0
      var idx = 0
      while (idx < pts.length - 1 && pick > minD(idx)) { pick -= minD(idx); idx += 1 }
      cents(c) = pts(idx).clone()
      var i = 0
      while (i < pts.length) { minD(i) = math.min(minD(i), d2(pts(i), cents(c))); i += 1 }
      c += 1
    }
    // Lloyd's: assign to nearest centroid, recompute means; empty clusters
    // keep their previous centroid (deterministic, no re-seeding jitter)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      var i = 0
      while (i < pts.length) {
        val p = pts(i)
        var best = 0; var bestD = d2(p, cents(0))
        var j = 1
        while (j < k) { val d = d2(p, cents(j)); if (d < bestD) { bestD = d; best = j }; j += 1 }
        counts(best) += 1
        var t = 0
        while (t < math.min(dim, p.length)) { sums(best)(t) += p(t); t += 1 }
        i += 1
      }
      moved = false
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          val nc = new Array[Double](dim)
          var t = 0
          while (t < dim) { nc(t) = sums(j)(t) / counts(j); t += 1 }
          if (d2(nc, cents(j)) > 1e-12) moved = true
          cents(j) = nc
        }
        j += 1
      }
      iter += 1
    }
    cents
  }

  /** IVF-Flat approximate top-k: corpus vectors are assigned to their
    * nearest centroid's inverted list (a codegen'd per-row expression — no
    * shuffle, no broadcast join); each query probes its `nprobe` nearest
    * lists and ranks those candidates exactly. Scan cost ~ nprobe/nlist of
    * the corpus; recall grows with nprobe. The classic IVF trade-off
    * (Jégou et al., and every FAISS deployment) expressed as two equi-joins
    * Catalyst already knows how to schedule. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, centroids: Array[Array[Double]],
             k: Int = 5, nprobe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.map(_.toSeq).toSeq
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("list_id", Exprs.nearestCentroids(col("nvec"), cents, 1).getItem(0))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("list_id", explode(Exprs.nearestCentroids(col("qvec"), cents, nprobe))))
    val scored = c.join(q, Seq("list_id"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Persisted IVF index — the production workflow: assignment is a full
    * corpus scan, so it is computed ONCE at build time and saved; query
    * batches then read only the probed inverted lists. On disk (epoch
    * layout, [[graft.plans.EpochStore]] — build/rebuild/compaction each
    * write a complete `<path>/state-NNNNNN/` and flip the commit marker
    * last, so a crash can never damage the live index): `centroids`
    * (list_id, centroid) and `lists` — the corpus with its list_id,
    * PARTITIONED BY list_id so a search with nprobe lists triggers
    * partition pruning and touches nprobe/nlist of the files (the
    * on-disk analog of FAISS's inverted lists). */
  def buildIvfIndex(corpus: DataFrame, path: String, nlist: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    seed: Long = 42L): Unit = {
    val centroids = fitCentroids(corpus, nlist, vecCol, seed = seed)
    val cents = centroids.map(_.toSeq).toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val (epoch, root) = graft.plans.EpochStore.begin(spark, path)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("list_id", Exprs.nearestCentroids(col("nvec"), cents, 1).getItem(0))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$root/lists")
    graft.plans.EpochStore.commit(spark, path, epoch)
    centroidCache.put(root, cents)
  }

  /** Current committed epoch root of a persisted IVF / IVF-PQ index —
    * one FS listing per call; fails fast with a rebuild message on a
    * pre-epoch (r17 or older) layout. Sidecar caches key on this
    * root, so a rebuild by another process (new quantizer, new epoch)
    * can never serve stale cached parameters — the same
    * cross-process-invalidation rule as the graph index. */
  private[graft] def ivfRoot(spark: org.apache.spark.sql.SparkSession,
                             path: String): String =
    graft.plans.EpochStore.resolve(spark, path).getOrElse {
      if (graft.plans.EpochStore.hasLegacyLayout(spark, path,
          Seq("lists", "centroids")))
        throw new IllegalStateException(
          s"IVF index at $path predates the epoch layout (no committed " +
            "state-NNNNNN directory); rebuild it with " +
            "Similarity.buildIvfIndex / buildIvfPqIndex")
      throw new IllegalStateException(
        s"no committed IVF index at $path; build it with " +
          "Similarity.buildIvfIndex / buildIvfPqIndex")
    }

  /** Centroids of a persisted IVF index, ordered so array index ==
    * list_id — the invariant BOTH search (probe-list selection) and
    * append (partition assignment) depend on; one loader on purpose so
    * the two sides can never disagree. nlist is small: driver-safe. */
  /** Per-JVM memo: the quantizer is frozen for an EPOCH's lifetime
    * (append never retrains; compact/rebuild write a new epoch), so a
    * resident stream ingester or a search loop should not pay a
    * parquet read per batch. Keyed by the resolved epoch root —
    * cross-process safe (another process's rebuild bumps the epoch) —
    * and bounded so dead epochs' entries age out (r17 advice). */
  private val centroidCache = new graft.plans.Memo[Seq[Seq[Double]]](256)

  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                            root: String): Seq[Seq[Double]] =
    centroidCache.getOrElseUpdate(root) {
      spark.read.parquet(s"$root/centroids")
        .orderBy("list_id").select("centroid").collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
    }

  /** Incremental IVF maintenance: assign NEW vectors to their nearest
    * existing centroid and APPEND to the persisted lists — only the
    * touched list partitions receive new files; the rest of the index is
    * never read or rewritten, so the per-batch cost is one scan of the
    * batch plus its own write, independent of corpus size (the streaming
    * ingest path of a vector store). The quantizer stays frozen, which
    * is standard until drift warrants a retrain — monitor assignment
    * distances and rebuild with [[buildIvfIndex]] when they creep. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       batch: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val root = ivfRoot(spark, path)
    val cents = loadCentroids(spark, root)
    batch.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("list_id", Exprs.nearestCentroids(col("nvec"), cents, 1).getItem(0))
      .write.mode("append").partitionBy("list_id").parquet(s"$root/lists")
  }

  /** Search a persisted IVF index. Probe-list filtering happens via an
    * IN predicate on the partition column, so the parquet reader prunes
    * whole list directories — only nprobe/nlist of the index is read. */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int = 5, nprobe: Int = 2,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // one root per search batch: centroids and lists always come from
    // the same committed epoch even if a compaction commits mid-search
    val root = ivfRoot(spark, path)
    val cents = loadCentroids(spark, root)
    val lists = spark.read.parquet(s"$root/lists")
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("list_id", explode(Exprs.nearestCentroids(col("qvec"), cents, nprobe))))
    val scored = lists.join(q, Seq("list_id"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
      // a replayed appendToIvfIndex lands the same (nid, nvec) row
      // twice in its frozen list — without ONE survivor per (qid, nid)
      // a duplicated unique nearest neighbour occupies TWO top-k ranks
      // and evicts the true k-th (the searchGraphIndex r15 rule,
      // carried to the IVF family). min(sim) also pins a deterministic
      // worst-score survivor if an id was ever reused with different
      // contents across lists; identical replays collapse losslessly.
      // Partial-aggregable: duplicates fold map-side before the shuffle.
      .groupBy(col("qid"), col("nid")).agg(min(col("sim")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Re-fold a persisted IVF index's lists to ONE row per
    * `(list_id, nid)` — the compaction [[appendToIvfIndex]]'s LSM
    * discipline defers to (the [[GraphAnn.compactGraphIndex]] rule
    * carried to this family): every replayed append's duplicate row
    * folds away (copies are identical, so search results cannot
    * change — spec-pinned) and per-list file counts reset to one file
    * per list however many append waves landed, so a streaming ingest
    * ([[graft.streaming.StreamIvfIngest]]) stays file-bounded. A
    * contract-violating id REUSE inside one list folds to the
    * lexicographically-min payload — deterministic on any
    * partitioning; ids reused across DIFFERENT probed lists keep one
    * row per list, and [[searchIvfIndex]]'s per-(qid, nid) `min(sim)`
    * guard resolves them at read time exactly as before. The folded
    * lists (plus a verbatim copy of the frozen sidecars) land in a
    * NEW epoch whose commit marker flips only after every file
    * ([[graft.plans.EpochStore]]): a crash mid-compaction leaves the
    * old epoch fully intact, and a reader that resolved it just
    * before the swap keeps a complete state for one more compaction
    * cycle — the r17-advice fix for the in-place overwrite, which
    * deleted the live lists before job commit. Run from the index's
    * single writer (e.g. the StreamIvfIngest foreachBatch). */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
    compactListsBy(spark, path, "nvec")

  /** [[compactIvfIndex]] for the IVF-PQ layout: the per-list payload
    * is the PQ code array, which folds under the same lexicographic
    * min. */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit =
    compactListsBy(spark, path, "codes")

  private def compactListsBy(spark: org.apache.spark.sql.SparkSession,
                             path: String, payload: String): Unit = {
    val root = ivfRoot(spark, path)
    // derived fully from the OLD epoch before any new files land
    val lists = spark.read.parquet(s"$root/lists")
      .groupBy(col("list_id"), col("nid"))
      .agg(min(col(payload)).as(payload))
      .select(col("nid"), col(payload), col("list_id"))
      .repartition(col("list_id"))
      .sortWithinPartitions(col("list_id"), col("nid"))
      .localCheckpoint(true)
    val (epoch, newRoot) = graft.plans.EpochStore.begin(spark, path)
    // the frozen sidecars copy verbatim (tiny: nlist + m*ksub rows)
    spark.read.parquet(s"$root/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$newRoot/centroids")
    if (graft.plans.EpochStore.subdirExists(spark, root, "codebooks"))
      spark.read.parquet(s"$root/codebooks")
        .coalesce(1).write.mode("overwrite").parquet(s"$newRoot/codebooks")
    lists.write.mode("overwrite").partitionBy("list_id").parquet(s"$newRoot/lists")
    graft.plans.EpochStore.commit(spark, path, epoch)
  }

  /** Quantizer-drift observability (r17 verdict item 5): per-batch
    * assignment-distance statistics of a vector population against a
    * FROZEN centroid set — the number a user watches to decide when
    * the documented "rebuild when assignment distances creep" retrain
    * trigger has fired, instead of a vibe. One row per `batch` value:
    * `(batch, n_vecs, mean_ppm, p90_milli, max_milli)` where the
    * per-row distance is `floor((1 - max_c cos(v, c)) * 1000 + 0.5)`
    * — milli-quantized BEFORE aggregation (the q30/q189 device: both
    * engines run the identical double rounding, so a last-ulp
    * reduction-order drift can never change the stats), the mean is
    * reported in exact integer ppm of a unit distance, and the p90 is
    * the DISCRETE 90th percentile (the value at rank `ceil(0.9 n)` of
    * the ascending sort — deterministic on any partitioning, no
    * interpolation to disagree about).
    *
    * Shape at scale: the centroid matrix is in-plan literals
    * (codegen'd `greatest` over `nlist` cosines — one corpus scan, no
    * join, no shuffle of vectors); the stats shuffle carries one
    * `(batch, d_milli)` long pair per row, and everything but the p90
    * rank-pick folds map-side. Batches are whatever the caller keys
    * by — ingest day, micro-batch id, source shard. */
  def assignmentDrift(vectors: DataFrame, centroids: Seq[Seq[Double]],
                      batch: Column,
                      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "assignmentDrift: no centroids")
    val cosines = centroids.map(c =>
      cosine(col(vecCol).cast("array<double>"), typedLit(c)))
    val d = floor((lit(1.0) - (if (cosines.size == 1) cosines.head
      else greatest(cosines: _*))) * 1000.0 + 0.5).cast("long")
    val perRow = vectors.select(batch.as("batch"), d.as("d_milli"))
    val agg = perRow.groupBy(col("batch")).agg(
      count(lit(1)).as("n_vecs"),
      sum(col("d_milli")).as("_sum"),
      max(col("d_milli")).as("max_milli"))
    val ranked = perRow.withColumn("_rn", row_number().over(
      Window.partitionBy(col("batch")).orderBy(col("d_milli").asc)))
    // integer arithmetic throughout: `div` (not `/`, which routes
    // through double and loses exactness past 2^53) matches DuckDB's
    // `//` floor division on the nonnegative values here
    val p90 = ranked.join(agg.select(col("batch"), col("n_vecs")), "batch")
      .where(col("_rn") === expr("(9 * n_vecs + 9) div 10"))
      .select(col("batch"), col("d_milli").as("p90_milli"))
    agg.join(p90, Seq("batch"))
      .select(col("batch"), col("n_vecs"),
        expr("(_sum * 1000) div n_vecs").as("mean_ppm"),
        col("p90_milli"), col("max_milli"))
  }

  /** [[assignmentDrift]] against a persisted IVF/IVF-PQ index's own
    * frozen centroids — the production monitor for a
    * [[graft.streaming.StreamIvfIngest]] resident: run it over each
    * ingest window and rebuild the index when the stats creep above
    * the build-time baseline. */
  def ivfDriftStats(spark: org.apache.spark.sql.SparkSession, path: String,
                    vectors: DataFrame, batch: Column,
                    vecCol: String = "embedding"): DataFrame =
    assignmentDrift(vectors,
      loadCentroids(spark, ivfRoot(spark, path)).map(_.toSeq), batch, vecCol)

  /** Self-certifying recall gate for an ANN result: join the approximate
    * top-k (qid, nid, ...) against the exact top-k computed in the same
    * plan and emit one row per query id with `recall_ok` — whether the ANN
    * search hit at least `minHits` of the true top-k. The ANN rows
    * themselves are engine-specific (bucket hashes, centroid geometry), so
    * no cross-engine hash can check them; the INVARIANT is checkable by
    * any engine (oracle: every query id, TRUE). A recall collapse — e.g.
    * round 2's +1-biased hyperplanes — turns booleans false and the
    * driver's correctness row red, which is exactly the regression signal
    * a `no_oracle` row could never give. */
  def recallCertificate(approx: DataFrame, exact: DataFrame, minHits: Int): DataFrame = {
    val hits = approx.select(col("qid"), col("nid"))
      .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    exact.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), (coalesce(col("hits"), lit(0L)) >= minHits).as("recall_ok"))
  }

  /** Approximate top-k: exact ranking restricted to same-bucket candidates.
    * Lower `planes` => bigger buckets => higher recall & cost.
    *
    * `probeFlips` (multi-probe LSH, Lv et al. '07): additionally probe the
    * buckets at Hamming distance 1 from the query's bucket, flipping each
    * of the first `probeFlips` planes — a near-miss on one hyperplane side
    * no longer costs the neighbor. Candidate volume grows ~(probeFlips+1)x
    * while recall approaches exact much faster than shrinking `planes`
    * (which grows EVERY bucket instead of just the query's probe set). */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int = 5, planes: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding",
             probeFlips: Int = 0): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= planes)
    val qb = lshBucket(col("qvec"), planes)
    val probes = array((qb +: (0 until probeFlips).map(p =>
      qb.bitwiseXOR(lit(1L << p)))): _*)
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("bucket", explode(probes)))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("bucket", lshBucket(col("nvec"), planes))
    val scored = c.join(q, Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .dropDuplicates("qid", "nid") // a neighbor may match several probes
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  // ------------------------------------------------------------------- PQ

  /** Train product-quantization codebooks (Jégou/Douze/Schmid, TPAMI 2011)
    * on a BOUNDED sample — the same discipline as [[fitCentroids]]: PQ
    * codebook quality saturates at a few hundred points per centroid, so
    * training collects `samplePerCentroid * ksub` vectors at ANY corpus
    * size and runs m seeded local k-means fits (one per subspace, zero
    * Spark jobs per iteration). Returns codebooks[m][ksub][dim/m].
    *
    * Why PQ at 100 TB: a 64-dim float corpus is 256 B/vector; m=8 PQ codes
    * are 8 B — the searchable index shrinks ~30x, which is the difference
    * between an index that fits hot storage and one that doesn't. */
  def pqTrain(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
              vecCol: String = "embedding", seed: Long = 42L,
              maxIter: Int = 10, samplePerCentroid: Int = 256,
              knownCount: Option[Long] = None): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1)
    val target = samplePerCentroid.toLong * ksub
    val n = knownCount.getOrElse(corpus.count()) // see fitCentroids note
    val sampled =
      if (n <= target) corpus
      else corpus.sample(withReplacement = false,
        fraction = math.min(1.0, target.toDouble * 1.05 / n), seed)
    val pts = sampled.select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray).filter(_.nonEmpty)
    require(pts.nonEmpty, "pqTrain: no non-empty vectors to train on")
    val dim = pts(0).length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = pts.filter(_.length == dim)
        .map(p => java.util.Arrays.copyOfRange(p, s * dsub, (s + 1) * dsub))
      kmeansLocal(sub, ksub, seed + s, maxIter)
    }
  }

  /** PQ-encode a vector table: (id, codes array<int> of length m). One
    * codegen'd pass per row (graft.expr.PqCodes); no shuffle — encoding
    * runs at scan speed and the output is what a persisted PQ index
    * stores instead of raw vectors. Ragged rows encode to null. */
  def pqEncode(df: DataFrame, codebooks: Array[Array[Array[Double]]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("nid"),
      Exprs.pqCodes(col(vecCol), booksAsSeq(codebooks)).as("codes"))

  private def booksAsSeq(b: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
    b.map(_.map(_.toSeq).toSeq).toSeq

  /** Per-query ADC lookup table, flattened to m*ksub doubles:
    * lut[s*ksub + c] = ||q_s - codebook[s][c]||². Driver-side — queries
    * are a small batch by the same contract as [[knnCosine]]'s broadcast. */
  private def pqLutRows(queries: DataFrame, codebooks: Array[Array[Array[Double]]],
                        idCol: String, vecCol: String): Seq[(Long, Seq[Double])] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().toSeq.map { r =>
        val q = r.getSeq[Double](1).toArray
        require(q.length == m * dsub,
          s"pq query dim ${q.length} != codebook dim ${m * dsub}")
        val lut = new Array[Double](m * ksub)
        var s = 0
        while (s < m) {
          var c = 0
          while (c < ksub) {
            val cent = codebooks(s)(c)
            var d2 = 0.0
            var j = 0
            while (j < dsub) { val d = q(s * dsub + j) - cent(j); d2 += d * d; j += 1 }
            lut(s * ksub + c) = d2
            c += 1
          }
          s += 1
        }
        (r.getLong(0), lut.toSeq)
      }
  }

  /** PQ top-k by asymmetric distance: every corpus row costs m table
    * lookups against the query's broadcast LUT (graft.expr.PqAdc) — a
    * full-corpus scan, but over codes ~30x smaller than the raw vectors
    * and with no distance arithmetic per pair. Self-retrieval is exact by
    * construction: a vector's own codes minimize the ADC sum over ALL
    * possible code words (per subspace the nearest centroid is, by
    * definition of encoding, the LUT's smallest entry), which is what the
    * q104 certificate pins. Rank ties break by nid for determinism. */
  def pqKnn(queries: DataFrame, encoded: DataFrame,
            codebooks: Array[Array[Array[Double]]], k: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val ksub = codebooks(0).length
    val q = broadcast(pqLutRows(queries, codebooks, idCol, vecCol).toDF("qid", "lut"))
    val scored = encoded.crossJoin(q)
      .select(col("qid"), col("nid"),
        Exprs.pqAdc(col("codes"), col("lut"), ksub).as("adist"))
      .where(col("adist").isNotNull)
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("adist"))
  }

  /** IVF-PQ: coarse quantizer prunes to nprobe/nlist of the corpus
    * (equi-join on list_id, exactly [[ivfKnn]]'s shape), then candidates
    * rank by ADC over codes instead of exact cosine over raw vectors —
    * the FAISS IVFPQ composition, as two narrow scans and one equi-join.
    * Codes here are trained on raw vectors (not residuals); residual
    * encoding is the documented refinement when recall at low nprobe
    * matters more than one extra corpus pass at build time. */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame,
               centroids: Array[Array[Double]],
               codebooks: Array[Array[Array[Double]]], k: Int = 5,
               nprobe: Int = 2, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val ksub = codebooks(0).length
    val cents = centroids.map(_.toSeq).toSeq
    val c = corpus.select(
      Exprs.nearestCentroids(col(vecCol), cents, 1).getItem(0).as("list_id"),
      col(idCol).as("nid"),
      Exprs.pqCodes(col(vecCol), booksAsSeq(codebooks)).as("codes"))
    val luts = pqLutRows(queries, codebooks, idCol, vecCol).toDF("qid", "lut")
    val probes = queries.select(col(idCol).as("qid"),
      explode(Exprs.nearestCentroids(col(vecCol), cents, nprobe)).as("list_id"))
    val q = broadcast(probes.join(luts, "qid"))
    val scored = c.join(q, Seq("list_id"))
      .select(col("qid"), col("nid"),
        Exprs.pqAdc(col("codes"), col("lut"), ksub).as("adist"))
      .where(col("adist").isNotNull)
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("adist"))
  }

  /** Train PQ codebooks on coarse-quantizer RESIDUALS (vec - nearest
    * centroid) — the full FAISS IVFPQ recipe (Jégou et al. §IV): residuals
    * concentrate near zero regardless of which cell a vector lives in, so
    * the same ksub codes resolve much finer structure than raw-vector PQ
    * at equal bytes. Same bounded-sample discipline as [[pqTrain]]; the
    * residual subtraction happens on the collected sample, zero extra
    * Spark jobs. */
  def pqTrainResidual(corpus: DataFrame, centroids: Array[Array[Double]],
                      m: Int = 8, ksub: Int = 16,
                      vecCol: String = "embedding", seed: Long = 42L,
                      maxIter: Int = 10,
                      samplePerCentroid: Int = 256,
                      knownCount: Option[Long] = None): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1 && centroids.nonEmpty)
    val target = samplePerCentroid.toLong * ksub
    val n = knownCount.getOrElse(corpus.count()) // see fitCentroids note
    val sampled =
      if (n <= target) corpus
      else corpus.sample(withReplacement = false,
        fraction = math.min(1.0, target.toDouble * 1.05 / n), seed)
    val pts = sampled.select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray).filter(_.nonEmpty)
    require(pts.nonEmpty, "pqTrainResidual: no non-empty vectors to train on")
    val dim = pts(0).length
    require(dim % m == 0, s"pqTrainResidual: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val residuals = pts.filter(_.length == dim).map { p =>
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        val nn = math.min(dim, cent.length)
        var d2 = 0.0; var j = 0
        while (j < nn) { val d = p(j) - cent(j); d2 += d * d; j += 1 }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      val cent = centroids(best)
      Array.tabulate(dim)(j => p(j) - (if (j < cent.length) cent(j) else 0.0))
    }
    Array.tabulate(m) { s =>
      kmeansLocal(residuals.map(r =>
        java.util.Arrays.copyOfRange(r, s * dsub, (s + 1) * dsub)), ksub, seed + s, maxIter)
    }
  }

  /** Per-(query, probed list) residual LUTs: lut[s*ksub+c] =
    * ||(q - C_list)_s - codebook[s][c]||². nprobe rows per query —
    * still driver-tiny (|queries| * nprobe * m * ksub doubles). */
  private def residualLutRows(queries: DataFrame,
                              codebooks: Array[Array[Array[Double]]],
                              centroids: Array[Array[Double]], nprobe: Int,
                              idCol: String,
                              vecCol: String): Seq[(Long, Int, Seq[Double])] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().toSeq.flatMap { r =>
        val q = r.getSeq[Double](1).toArray
        require(q.length == m * dsub,
          s"pq query dim ${q.length} != codebook dim ${m * dsub}")
        val d2s = centroids.indices.map { c =>
          val cent = centroids(c)
          var d2 = 0.0; var j = 0
          val nn = math.min(q.length, cent.length)
          while (j < nn) { val d = q(j) - cent(j); d2 += d * d; j += 1 }
          (d2, c)
        }.sorted.take(nprobe)
        d2s.map { case (_, listId) =>
          val cent = centroids(listId)
          val lut = new Array[Double](m * ksub)
          var s = 0
          while (s < m) {
            var c = 0
            while (c < ksub) {
              val code = codebooks(s)(c)
              var d2 = 0.0; var j = 0
              while (j < dsub) {
                val qi = s * dsub + j
                val rq = q(qi) - (if (qi < cent.length) cent(qi) else 0.0)
                val d = rq - code(j)
                d2 += d * d; j += 1
              }
              lut(s * ksub + c) = d2
              c += 1
            }
            s += 1
          }
          (r.getLong(0), listId, lut.toSeq)
        }
      }
  }

  /** IVF-PQ with residual encoding: [[ivfPqKnn]]'s plan shape — two
    * narrow scans, one equi-join on list_id — but codes store the
    * residual and each probe carries its own per-list LUT, so distances
    * are exact-to-the-codebook within every probed cell. The recall
    * upgrade costs nothing per corpus row (same m lookups); only the
    * broadcast grows from one LUT per query to nprobe. */
  def ivfPqKnnResidual(queries: DataFrame, corpus: DataFrame,
                       centroids: Array[Array[Double]],
                       codebooks: Array[Array[Array[Double]]], k: Int = 5,
                       nprobe: Int = 2, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val ksub = codebooks(0).length
    val cents = centroids.map(_.toSeq).toSeq
    val c = corpus.select(
      Exprs.nearestCentroids(col(vecCol), cents, 1).getItem(0).as("list_id"),
      col(idCol).as("nid"),
      Exprs.pqCodes(col(vecCol), booksAsSeq(codebooks), cents).as("codes"))
    val q = broadcast(
      residualLutRows(queries, codebooks, centroids, nprobe, idCol, vecCol)
        .toDF("qid", "list_id", "lut"))
    val scored = c.join(q, Seq("list_id"))
      .select(col("qid"), col("nid"),
        Exprs.pqAdc(col("codes"), col("lut"), ksub).as("adist"))
      .where(col("adist").isNotNull)
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("adist"))
  }

  /** Persisted IVF-PQ index — [[buildIvfIndex]]'s layout with PQ codes in
    * the inverted lists instead of raw vectors: `<path>/centroids`
    * (coarse quantizer), `<path>/codebooks` ((sub, code, centroid) rows),
    * `<path>/lists` = (nid, codes) PARTITIONED BY list_id. Searches read
    * nprobe/nlist of an index that is itself ~30x smaller than the
    * IVF-Flat lists — at 100 TB of raw vectors this is the difference
    * between an index served from hot storage and one that isn't. Raw
    * vectors are NOT stored: exact re-ranking joins back to the corpus
    * table by id for the top candidates, which is a k-row lookup, not an
    * index scan. */
  def buildIvfPqIndex(corpus: DataFrame, path: String, nlist: Int,
                      m: Int = 8, ksub: Int = 16, idCol: String = "vec_id",
                      vecCol: String = "embedding", seed: Long = 42L,
                      residual: Boolean = false): Unit = {
    // one count action shared by both trainers (round-6 advice: each
    // trainer counting for itself re-scans derived inputs)
    val n = Some(corpus.count())
    val centroids = fitCentroids(corpus, nlist, vecCol, seed = seed, knownCount = n)
    val books =
      if (residual) pqTrainResidual(corpus, centroids, m, ksub, vecCol, seed, knownCount = n)
      else pqTrain(corpus, m, ksub, vecCol, seed, knownCount = n)
    val cents = centroids.map(_.toSeq).toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val (epoch, root) = graft.plans.EpochStore.begin(spark, path)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    // the encoding mode is PINNED with the codebooks (minhashIndex's
    // params discipline): a residual index searched with plain-PQ LUTs
    // would return silently wrong distances, never an error
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq, residual) }
    }.toSeq.toDF("sub", "code", "centroid", "residual")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/codebooks")
    corpus.select(
      Exprs.nearestCentroids(col(vecCol), cents, 1).getItem(0).as("list_id"),
      col(idCol).as("nid"),
      Exprs.pqCodes(col(vecCol), booksAsSeq(books),
        if (residual) cents else Nil).as("codes"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$root/lists")
    graft.plans.EpochStore.commit(spark, path, epoch)
    centroidCache.put(root, cents)
    codebookCache.put(root, (books, residual))
  }

  /** [[centroidCache]]'s codebook twin — same frozen-quantizer,
    * epoch-keyed, bounded rule. */
  private val codebookCache =
    new graft.plans.Memo[(Array[Array[Array[Double]]], Boolean)](256)

  /** Codebooks of a persisted IVF-PQ index plus the pinned encoding
    * mode, ordered so [sub][code] match the stored rows — the
    * encode/search shared loader, same discipline as
    * [[loadCentroids]]. m*ksub rows: driver-safe. Legacy indexes (no
    * `residual` column) load as plain-PQ — the shape they were built
    * with. */
  private def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                            root: String): (Array[Array[Array[Double]]], Boolean) =
    codebookCache.getOrElseUpdate(root)(loadCodebooksUncached(spark, root))

  private def loadCodebooksUncached(spark: org.apache.spark.sql.SparkSession,
                            root: String): (Array[Array[Array[Double]]], Boolean) = {
    val df = spark.read.parquet(s"$root/codebooks")
    val rows = df.orderBy("sub", "code").collect()
    val books = rows
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray)
      .toArray
    val residual = df.columns.contains("residual") &&
      rows.headOption.exists(_.getAs[Boolean]("residual"))
    (books, residual)
  }

  /** Search a persisted IVF-PQ index: probe-list partition pruning +
    * broadcast per-query LUTs + ADC ranking over stored codes. The
    * stored encoding mode dispatches the LUT shape — one per query for
    * plain PQ, one per (query, probed list) for residual. */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int = 5, nprobe: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val root = ivfRoot(spark, path)
    val cents = loadCentroids(spark, root)
    val (books, residual) = loadCodebooks(spark, root)
    val ksub = books(0).length
    val lists = spark.read.parquet(s"$root/lists")
    val q =
      if (residual) broadcast(
        residualLutRows(queries, books, cents.map(_.toArray).toArray,
          nprobe, idCol, vecCol).toDF("qid", "list_id", "lut"))
      else {
        val luts = pqLutRows(queries, books, idCol, vecCol).toDF("qid", "lut")
        val probes = queries.select(col(idCol).as("qid"),
          explode(Exprs.nearestCentroids(col(vecCol), cents, nprobe)).as("list_id"))
        broadcast(probes.join(luts, "qid"))
      }
    val scored = lists.join(q, Seq("list_id"))
      .select(col("qid"), col("nid"),
        Exprs.pqAdc(col("codes"), col("lut"), ksub).as("adist"))
      .where(col("adist").isNotNull)
      // replayed-append dedupe, the searchIvfIndex rule: one survivor
      // per (qid, nid); max(adist) = the deterministic worst-distance
      // survivor under id reuse, lossless for identical replays
      .groupBy(col("qid"), col("nid")).agg(max(col("adist")).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("adist"))
  }

  /** Exact re-rank of an ANN shortlist — the second stage every
    * production PQ deployment runs: the compressed index proposes
    * `shortlist` candidates (cheap, slightly lossy), then the TRUE cosine
    * is computed for just those (qid, nid) pairs and the top k kept.
    * Cost shape at 100 TB: the shortlist is |queries|*shortK rows — tiny —
    * so it broadcasts into an equi-join against the corpus, and the
    * full-precision vectors are read for candidate ids only (a lookup,
    * never an index scan). Compression artifacts (ADC ties, quantization
    * rank swaps) disappear for the final ranking. */
  def rerankExact(shortlist: DataFrame, queries: DataFrame, corpus: DataFrame,
                  k: Int = 5, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val cand = broadcast(shortlist.select(col("qid"), col("nid"))
      .join(q, "qid"))
    val scored = c.join(cand, Seq("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }

  /** Incremental IVF-PQ maintenance: encode a NEW batch with the frozen
    * quantizer+codebooks and append to the touched list partitions only —
    * [[appendToIvfIndex]]'s contract, at code (not vector) write volume. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         batch: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val root = ivfRoot(spark, path)
    val cents = loadCentroids(spark, root)
    val (books, residual) = loadCodebooks(spark, root)
    batch.select(
      Exprs.nearestCentroids(col(vecCol), cents, 1).getItem(0).as("list_id"),
      col(idCol).as("nid"),
      Exprs.pqCodes(col(vecCol), booksAsSeq(books),
        if (residual) cents else Nil).as("codes"))
      .write.mode("append").partitionBy("list_id").parquet(s"$root/lists")
  }

  /** SEMANTIC benchmark contamination — the embedding-space sibling of
    * [[Retrieval.contaminationTriage]]'s lexical BM25 triage (the
    * second decontamination modality GPT-3/Llama-style audits run:
    * paraphrased eval items share no n-grams but sit next to their
    * source in embedding space). Every corpus vector is scored against
    * the broadcast benchmark probe set; the report is the DROP LIST —
    * one row per corpus vector some probe matched at or above
    * `minCos`, with the hit count and the strongest match.
    *
    * Cosines are rounded to 3 decimals BEFORE the threshold compare
    * and the max (the q30 device: both engines run the identical
    * double rounding, so a last-ulp reduction-order drift can never
    * flip a flag or the hash).
    *
    * Shape at scale: benchmark sets are small (thousands of eval
    * items) — the probe side broadcasts, the corpus side is ONE scan
    * feeding a map-side-combined groupBy(nid), no window, no shuffle
    * of vectors (only the ≥-threshold survivors, a frame bounded by
    * corpus-hits). This is the EXACT baseline; at 100 TB the same
    * report runs over [[bqKnn]]/IVF candidates with this as the
    * rescoring contract. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            minCos: Double = 0.6,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            guardSelfPairs: Boolean = true): DataFrame = {
    // guardSelfPairs=true is the q189 shape (bench drawn FROM the
    // corpus: a vector must not flag itself; caller remaps probe ids
    // off the corpus range, the +1e6 convention). When the bench is an
    // EXTERNAL eval set its ids are an independent namespace — a probe
    // that happens to share a doc's id is still a legitimate
    // comparison, so the sweep/gate callers pass false and every
    // (probe, doc) pair scores.
    val q = broadcast(bench.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val base = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    (if (guardSelfPairs) base.join(q, col("qid") =!= col("nid"))
     else base.crossJoin(q))
      .select(col("nid"),
        (floor(cosine(col("qvec"), col("nvec")) * 1000 + 0.5) / 1000.0)
          .as("cos3"))
      .where(col("cos3") >= minCos)
      .groupBy(col("nid"))
      .agg(count(lit(1)).as("n_probes_hit"), max(col("cos3")).as("max_cos3"))
  }

  /** Σ of the centered outer product — the Gram/covariance accumulator
    * behind [[pcaProjection]]. Buffer = the upper triangle (d·(d+1)/2
    * longs, ~16 KB at d = 64) of Σᵢ cᵢcᵢᵀ over rows centered by the
    * TRUNCATED integer mean, cⱼ = mⱼ − μⱼ with μⱼ = sign·(|Sⱼ| div n)
    * — exact integers both engines replay, and |c| stays O(|m|max)
    * REGARDLESS of corpus size (the first cut of this op scaled rows
    * by n to keep the exact mean, which grows Gram entries as n³ and
    * silently wraps int64 near 2·10⁴ vectors — truncated-mean
    * centering shifts the data by < 1 milli-unit per dimension and
    * bounds entries at n·(2|m|max)², exact past 10¹² vectors).
    * Map-side combine reduces every partition to ONE triangle; the
    * shuffle moves #partitions·16 KB regardless of corpus size. */
  private class GramAgg(mu: Array[Long])
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Array[Long]] {
    private val d = mu.length
    override def zero: Array[Long] = new Array[Long](d * (d + 1) / 2)
    override def reduce(buf: Array[Long], m: Seq[Long]): Array[Long] = {
      val c = new Array[Long](d)
      var j = 0
      while (j < d) { c(j) = m(j) - mu(j); j += 1 }
      var idx = 0
      j = 0
      while (j < d) {
        var k = j
        while (k < d) { buf(idx) += c(j) * c(k); idx += 1; k += 1 }
        j += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }

  /** Distributed Lloyd's k-means over the FULL corpus, integer-exact —
    * the clustering step of SemDeDup-style semantic curation (Abbas et
    * al. '23: cluster, then dedup/sample within clusters) and of
    * cluster-balanced data selection. [[kmeansLocal]] deliberately
    * trains on a bounded sample (the FAISS quantizer discipline);
    * THIS op is the other contract — every vector gets its final
    * assignment, so the per-round aggregation must be distributed.
    *
    * Exact integer discipline (the q206 family):
    *   - elements milli-quantize first (q30 device);
    *   - init = the k lowest-id rows (deterministic, no seeding);
    *   - assignment = argmin of Σ(m−c)² with ties to the LOWEST cid —
    *     array_min over the packed keys d²·k + cid (the q188 tie-key
    *     device), decoded by mod/div;
    *   - centroid update = per-dimension sign-factored integer mean
    *     (sum div count on abs, sign reapplied — div/floor parity);
    *     empty clusters keep their previous centroid (the
    *     [[kmeansLocal]] rule, replayed in SQL as a COALESCE left
    *     join).
    *
    * Shape at scale: each round is ONE corpus scan — centroids ride
    * along as broadcast literals (k·d longs), the update aggregates
    * map-side into ≤ k·d rows, and only that bounded frame is
    * collected (eager by design, the q187 bounded-iteration
    * discipline). The returned frame is one more lazy zero-shuffle
    * scan emitting (id, cluster, dist2) under the FINAL centroids. */
  def kmeansClusters(emb: DataFrame, k: Int = 4, rounds: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     persistCorpus: Boolean = false): DataFrame = {
    val q = quantized(emb, idCol, vecCol)
    val t = if (persistCorpus) q.persist() else q
    val cents = kmeansTrain(t, k, rounds, idCol)
    if (persistCorpus) t.unpersist(false)
    // the returned lazy assignment reads the unpersisted projection, so
    // no CacheManager entry outlives the call
    assignWith(q, cents, idCol)
  }

  /** [[kmeansClusters]] with farthest-point (k-center) seeding
    * ([[kcenterSeeds]], Gonzalez '85) instead of id-order
    * initialization — the quality option when the first k ids may sit
    * in one region; costs k−1 extra one-scan argmax rounds before the
    * same Lloyd iterations. Seed pick order IS the cluster id.
    *
    * `persistCorpus` (both trainers, default OFF): cache the quantized
    * frame across the training scans — k−1 seed argmaxes plus `rounds`
    * Lloyd scans read the cache instead of rescanning the source, then
    * the cache releases BEFORE the lazy assignment is returned. Opt-in
    * because the frame is a scan-side projection of the corpus:
    * caching 100 TB is its own cost and the default rescan is the
    * honest choice there, but at index-build scale (the saveKmeans
    * path trains on bounded samples anyway) the cache converts
    * (k−1+rounds) scans into one. */
  def kmeansClustersKcenter(emb: DataFrame, k: Int = 4, rounds: Int = 4,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            persistCorpus: Boolean = false): DataFrame = {
    val q = quantized(emb, idCol, vecCol)
    val t = if (persistCorpus) q.persist() else q
    val cents = lloydRounds(t, kcenterSeeds(t, k, idCol), rounds)
    if (persistCorpus) t.unpersist(false)
    assignWith(q, cents, idCol)
  }

  /** The milli-quantized frame (id, m: array<long>) every k-means path
    * shares. */
  private def quantized(emb: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    emb.select(col(idCol),
      transform(col(vecCol),
        e => floor(e.cast("double") * 1000 + lit(0.5)).cast("long")).as("m"))

  /** Lloyd's rounds over a quantized frame — returns the final
    * centroids (k arrays of d longs; bounded driver state). See
    * [[kmeansClusters]] for the contract. */
  private def kmeansTrain(q: DataFrame, k: Int, rounds: Int,
                          idCol: String): Array[Array[Long]] = {
    require(k >= 1, "k must be positive")
    // bounded collect: the k init rows in id order
    val init: Array[Array[Long]] = q.orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(init.length == k, s"kmeansTrain: corpus smaller than k=$k")
    lloydRounds(q, init, rounds)
  }

  /** Farthest-point (k-center) seeds over a quantized frame —
    * Gonzalez '85's 2-approximation traversal, the deterministic
    * sibling of kmeans++ (whose D²-SAMPLING has no exact integer
    * replay; the farthest-point rule is its argmax limit and replays
    * verbatim): start from the lowest-id row, then k−1 times add the
    * row maximizing the min squared distance to the seeds so far
    * (ties to the lowest id). Spread-out seeds avoid Lloyd's
    * empty/merged-cluster pathologies that id-order initialization
    * hits when the first k rows share a region.
    *
    * Each round is ONE corpus scan — min-dist² comes from the same
    * codegen'd [[graft.expr.KmeansKey]] kernel assignment uses
    * (key div |seeds| IS the min d²), and only the single argmax row
    * is collected (orderBy+limit(1) = a bounded TakeOrdered, the
    * kmeansTrain discipline). Ragged vectors (NULL key) never seed. */
  private def kcenterSeeds(q: DataFrame, k: Int,
                           idCol: String): Array[Array[Long]] = {
    require(k >= 1, "k must be positive")
    val first = q.orderBy(col(idCol)).limit(1).collect()
    require(first.nonEmpty, "kcenterSeeds: empty corpus")
    var seeds = Vector(first(0).getSeq[Long](1).toArray)
    while (seeds.length < k) {
      val kk = seeds.length
      val next = q.select(col(idCol), col("m"),
          assignKey(seeds.toArray).as("_key"))
        .where(col("_key").isNotNull)
        .select(col(idCol), col("m"), expr(s"_key div $kk").as("_d2"))
        .orderBy(col("_d2").desc, col(idCol).asc)
        .limit(1).collect() // bounded: the one farthest row
      require(next.nonEmpty, s"kcenterSeeds: corpus smaller than k=$k")
      seeds = seeds :+ next(0).getSeq[Long](1).toArray
    }
    seeds.toArray
  }

  /** The Lloyd iteration body shared by both initializations. */
  private def lloydRounds(q: DataFrame, init: Array[Array[Long]],
                          rounds: Int): Array[Array[Long]] = {
    require(rounds >= 1, "rounds must be positive")
    val k = init.length
    var cents = init
    for (_ <- 1 to rounds) {
      // one scan: assign, then per-(cluster, dim) sums — ≤ k·d rows out
      val sums = q.select((assignKey(cents) % k).as("cid"),
          posexplode(col("m")).as(Seq("j", "v")))
        // a ragged vector (length != centroid dim) yields NULL from the
        // kernel — KmeansKey's contract says droppable row, not a crash;
        // without this the NULL-cid group NPEs getLong on the driver
        .where(col("cid").isNotNull)
        .groupBy(col("cid"), col("j"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
        .collect() // bounded: k·d rows
      val upd = cents.map(_.clone)
      sums.foreach { r =>
        val cid = r.getLong(0).toInt
        val sv = r.getLong(2); val cnt = r.getLong(3)
        upd(cid)(r.getInt(1)) =
          (if (sv < 0) -1L else 1L) * (math.abs(sv) / cnt)
      }
      cents = upd // clusters absent from `sums` keep their centroid
    }
    cents
  }

  /** argmin via the q188 tie-key device: key = d2·k + cid, so the min
    * key IS (smallest d2, ties to lowest cid). A codegen'd kernel
    * ([[graft.expr.KmeansKey]]) — the interpreted-HOF form (one
    * aggregate(zip_with) per centroid) paid per-element interpretation
    * k·d times per row and took ~180 s at (k=16, 100k rows) where the
    * kernel takes ~1 s. */
  private def assignKey(cents: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
    CB.column(graft.expr.KmeansKey(
      CB.expression(col("m")), cents.map(_.toSeq).toSeq))
  }

  /** One lazy zero-shuffle assignment scan under literal centroids. */
  private def assignWith(q: DataFrame, cents: Array[Array[Long]],
                         idCol: String): DataFrame = {
    val k = cents.length
    q.select(col(idCol), assignKey(cents).as("key"))
      .select(col(idCol), (col("key") % k).as("cluster"),
        expr(s"key div $k").as("dist2")) // `/` would be double division
  }

  /** Persist a trained k-means index: centroids, per-cluster training
    * radius (max dist² any training member reached — the outlier
    * threshold [[kmeansAssignFromIndex]] flags against), and a meta
    * row pinning k — the production shape: cluster ONCE, assign every
    * shard/stream against the saved index (the saveLm / IVF
    * discipline). */
  def saveKmeans(emb: DataFrame, path: String, k: Int = 4,
                 rounds: Int = 4, idCol: String = "vec_id",
                 vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = quantized(emb, idCol, vecCol)
    val cents = kmeansTrain(q, k, rounds, idCol)
    cents.zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (v, j) =>
        (i.toLong, j.toLong, v) } }.toSeq
      .toDF("cid", "j", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    assignWith(q, cents, idCol)
      .groupBy(col("cluster")).agg(max(col("dist2")).as("radius"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/radii")
    Seq(k).toDF("k").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/meta")
  }

  /** Bounded, immutable in-memory image of a persisted k-means index —
    * load ONCE per process/stream (the index cannot change while a
    * resident query runs; re-reading it per micro-batch pays parquet
    * jobs + a driver collect for nothing). */
  case class KmeansIndex(cents: Array[Array[Long]], radii: Map[Long, Long])

  /** Read a [[saveKmeans]] index into driver memory (k·d longs). */
  def loadKmeansIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): KmeansIndex = {
    val k = spark.read.parquet(s"$path/meta").head().getAs[Int]("k")
    val rows = spark.read.parquet(s"$path/centroids").collect()
    val d = rows.map(_.getAs[Long]("j")).max.toInt + 1
    val cents = Array.ofDim[Long](k, d)
    rows.foreach(r => cents(r.getAs[Long]("cid").toInt)(
      r.getAs[Long]("j").toInt) = r.getAs[Long]("cv"))
    val radii = spark.read.parquet(s"$path/radii").collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("radius")).toMap
    KmeansIndex(cents, radii)
  }

  /** Assign a frame against a LOADED index and flag outliers — vectors
    * whose dist² exceeds their cluster's TRAINING radius (the
    * embedding-stream anomaly read: a point the training corpus never
    * came near). One zero-shuffle scan: centroids ride the KmeansKey
    * kernel, radii ride an in-plan map literal; a cluster with no
    * recorded radius flags true (no training evidence). */
  def assignAgainstIndex(emb: DataFrame, idx: KmeansIndex,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    assignWith(quantized(emb, idCol, vecCol), idx.cents, idCol)
      .withColumn("outlier", coalesce(
        col("dist2") > element_at(typedLit(idx.radii), col("cluster")),
        lit(true)))
      .select(col(idCol), col("cluster"), col("dist2"), col("outlier"))

  /** [[assignAgainstIndex]] with a one-shot load — batch callers. */
  def kmeansAssignFromIndex(emb: DataFrame, path: String,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame =
    assignAgainstIndex(emb, loadKmeansIndex(emb.sparkSession, path),
      idCol, vecCol)

  /** Cluster-balanced CORESET with waterfilled budgets — the diverse
    * data-selection read the clustering exists for (SemDeDup/DSIR
    * family): an equal member budget per cluster (so no cluster
    * dominates the subset) EXCEPT that small clusters contribute all
    * they have, with the freed budget redistributed exactly
    * ([[Importance.waterfillOver]] on the cluster SIZES); within a
    * cluster, prototype-first selection — the `quota` members nearest
    * the centroid, ties to the lowest id.
    *
    * Shape at scale: the assignment scan runs twice (sizes + final
    * pick) — both zero-shuffle scans; the waterfill runs on the
    * ≤k-row size frame; the per-cluster rank is a window PARTITIONED
    * by cluster (each cluster sorts independently — never a global
    * sort), and the ≤k-row quota frame joins back broadcast. */
  def clusterCoreset(emb: DataFrame, budgetPpm: Long = 500000L,
                     k: Int = 4, rounds: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val assign = kmeansClusters(emb, k, rounds, idCol, vecCol)
    val sizes = assign.groupBy(col("cluster").as("source"))
      .agg(count(lit(1)).as("avail"))
    val quota = Importance.waterfillOver(sizes, budgetPpm)
      .select(col("source").as("cluster"),
        col("alloc_tokens").as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("dist2").asc, col(idCol).asc)
    assign.join(broadcast(quota), Seq("cluster"))
      .withColumn("pick_rank", row_number().over(w).cast("long") - 1L)
      .where(col("pick_rank") < col("quota"))
      .select(col(idCol), col("cluster"), col("dist2"), col("pick_rank"))
  }

  /** Per-cluster quality report over a [[kmeansClusters]] assignment —
    * the read a curation pipeline actually consumes from a clustering
    * run: member count, inertia (Σ dist², the k-selection elbow
    * statistic), the PROTOTYPE (the member nearest its centroid, ties
    * to the lowest id — SemDeDup keeps prototypes and samples around
    * them), and the radius (max dist², the dispersion read). One
    * map-side-combined groupBy over the assignment frame; the argmin /
    * argmax ride the same aggregation as packed min/max keys (the q188
    * tie-key device — dist² ≤ 4·10⁹·id-space would overflow a naive
    * pack, so the key is dist²·2^24 + id, valid while ids < 2^24 per
    * the documented bound; wider ids pack via struct min instead). */
  def clusterReport(assign: DataFrame, idCol: String = "vec_id"): DataFrame = {
    val guarded = when(col(idCol) < 0 || col(idCol) >= (1L << 24),
      raise_error(concat(lit("clusterReport: id outside [0, 2^24): "),
        col(idCol).cast("string"))).cast("long")).otherwise(col(idCol))
    // the OTHER packing bound: dist2·2^24 must stay inside int64 — a
    // silent wrap here corrupts the argmin with no error (and diverges
    // from DuckDB, which errors on BIGINT overflow)
    val guardedD2 = when(col("dist2") >= (1L << 39),
      raise_error(concat(lit("clusterReport: dist2 outside [0, 2^39): "),
        col("dist2").cast("string"))).cast("long")).otherwise(col("dist2"))
    val key = guardedD2 * lit(1L << 24) + guarded
    assign
      .select(col(idCol), col("cluster"), col("dist2"), key.as("k"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist2")).as("inertia"),
        (min(col("k")) % (1L << 24)).as("proto_id"),
        expr("min(k) div 16777216").as("proto_dist2"),
        max(col("dist2")).as("radius"))
  }

  /** Top principal component by power iteration, projected back onto
    * every vector — the embedding-quality probe a curation pipeline
    * runs before trusting its vectors (a dominant component carrying
    * most of the variance is the classic symptom of uncentered /
    * anisotropic embeddings, Mu & Viswanath '18; the projection is also
    * the 1-D "cartography" coordinate for diversity-aware sampling).
    *
    * Exact integer discipline, end to end replayable in SQL:
    *   - elements quantize to milli-units FIRST (floor(e·1000 + 0.5) —
    *     the q30 device), so every later step is integer arithmetic;
    *   - centering stays integral via the TRUNCATED integer mean:
    *     c = m − μ, μⱼ = sign·(|Sⱼ| div n) — a < 1-milli-unit shift of
    *     the data, chosen over exact n-scaled centering because the
    *     latter grows Gram entries as n³ (int64 wraps near 2·10⁴
    *     vectors), while |c| here is O(|m|max) at ANY corpus size;
    *   - the d×d Gram of the centered rows accumulates in ONE
    *     corpus pass ([[GramAgg]]: map-side-combined triangles);
    *   - `rounds` power-iteration steps run DRIVER-side on the d×d
    *     matrix in BigInt — bounded work, no data involved — with
    *     INFINITY-norm normalization to scale 2^20 each round
    *     (v ← sign(w)·(|w|·2^20 div max|w|)): an L2 norm would need an
    *     exact integer sqrt of a >2^52 radicand, which SQL cannot
    *     replay exactly, while max and div replay verbatim (numerators
    *     sign-factored — the cohenKappa rule);
    *   - deterministic start v₀ = (2^20, …): no randomness anywhere.
    *
    * Returned frame: one lazily-evaluated SCAN over the corpus emitting
    * (id, proj) with proj = (m − μ)·v = m·v − μ·v — the m·v − K form
    * keeps the per-row work one zip_with dot product against the
    * broadcast-literal component; zero shuffles in the final plan.
    * Eager by design (count + 64-long sum collect + the Gram job at
    * construction — the persisted-index discipline). */
  def pcaProjection(emb: DataFrame, rounds: Int = 8,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = quantized(emb, idCol, vecCol)
    val fit = pcaFit(q, rounds, idCol)
    // proj = (m − μ)·v = m·v − μ·v; v and K are bounded driver constants
    val kConst = (0 until fit.d).map(j => BigInt(fit.mu(j)) * fit.v(j)).sum
    require(kConst.isValidLong,
      "pcaProjection: μ·v exceeds int64 — route proj through decimal")
    val vLit = array(fit.v.map(x => lit(x.toLong)): _*)
    q.select(col(idCol),
      (aggregate(zip_with(col("m"), vLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x) - lit(kConst.toLong)).as("proj"))
  }

  /** Bounded driver state of a PCA fit: truncated means, the packed
    * Gram triangle, and the converged component (scale 2^20). */
  private case class PcaFit(n: Long, d: Int, mu: Array[Long],
                            tri: Array[Long], v: Array[BigInt])

  /** Upper-triangle → full symmetric d×d in BigInt (one packing rule,
    * one unpacker — pcaFit and pcaAnisotropy share it). */
  private def unpackTriangle(tri: Array[Long], d: Int): Array[Array[BigInt]] = {
    val g = Array.ofDim[BigInt](d, d)
    var idx = 0
    for (j <- 0 until d; k <- j until d) {
      g(j)(k) = BigInt(tri(idx)); g(k)(j) = g(j)(k); idx += 1
    }
    g
  }

  /** Quantized-frame PCA fit — the eager half [[pcaProjection]] and
    * [[pcaAnisotropy]] share: sum/count collects, one GramAgg pass,
    * `rounds` BigInt power rounds (see pcaProjection for the
    * contract). */
  private def pcaFit(q: DataFrame, rounds: Int, idCol: String): PcaFit = {
    val spark = q.sparkSession
    import spark.implicits._
    // bounded collects: one 64-row sum frame + the scalar count
    val sumRows = q.select(posexplode(col("m")).as(Seq("j", "v")))
      .groupBy(col("j")).agg(sum(col("v")).as("sj"))
      .orderBy(col("j")).collect()
    require(sumRows.nonEmpty, "pcaFit: empty corpus")
    val s = sumRows.map(_.getLong(1))
    val d = s.length
    val n = q.count()
    // truncated integer mean, sign factored (div/floor parity)
    val mu = s.map(sj => (if (sj < 0) -1L else 1L) * (math.abs(sj) / n))
    val tri = q.select(col("m")).as[Seq[Long]]
      .groupByKey(_ => 0) // one global triangle; partials merge map-side
      .agg(new GramAgg(mu).toColumn.name("g")).collect().head._2
    val g = unpackTriangle(tri, d)
    val scale = BigInt(1) << 20
    var v = Array.fill(d)(scale)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(d)(j =>
        (0 until d).map(k => g(j)(k) * v(k)).sum)
      val mx = w.map(_.abs).max
      v = if (mx == 0) v
          else w.map(x => (if (x < 0) -1 else 1) * ((x.abs * scale) / mx))
    }
    PcaFit(n, d, mu, tri, v)
  }

  /** Anisotropy report — the single number the Mu & Viswanath '18
    * probe is run FOR: what share of total variance the dominant
    * component carries. One row:
    *
    *   anisotropy_ppm = 10⁶ · (vᵀGv / vᵀv) / tr(G)
    *                  = (10⁶ · vᵀGv) div (vᵀv · tr(G))
    *
    * with v the [[pcaProjection]] component — the Rayleigh quotient
    * (≈ λ_max after convergence) over the variance total. Near 1/d·10⁶
    * = isotropic; large = a rogue dominant direction (uncentered or
    * collapsed embeddings — the all-representations-look-alike failure
    * retrieval teams debug). Every operand is an exact integer from
    * the SAME fit the projection uses (BigInt on the driver, HUGEINT
    * in the oracle); tr(G) also reports, as the exact total variance
    * (×n) in milli² units. No additional corpus scan: the report is
    * pure arithmetic on the collected triangle. */
  def pcaAnisotropy(emb: DataFrame, rounds: Int = 8,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val fit = pcaFit(quantized(emb, idCol, vecCol), rounds, idCol)
    val d = fit.d
    val g = unpackTriangle(fit.tri, d)
    val vGv = (for (j <- 0 until d; k <- 0 until d)
      yield fit.v(j) * g(j)(k) * fit.v(k)).sum
    val vv = fit.v.map(x => x * x).sum
    val trace = (0 until d).map(j => g(j)(j)).sum
    val ppm =
      if (vv == 0 || trace == 0) null
      else {
        // Rayleigh of a PSD Gram is within [0, λ_max] ≤ trace: ratio ≤ 1e6
        val r = (BigInt(1000000) * vGv) / (vv * trace)
        java.lang.Long.valueOf(r.toLong)
      }
    require(trace.isValidLong,
      "pcaAnisotropy: trace exceeds int64 — report per shard at this size")
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((fit.n, d.toLong, trace.toLong)).toDF("n_vectors", "dim", "trace")
      .withColumn("anisotropy_ppm",
        lit(ppm).cast("long"))
  }
}
