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

  /** Cosine similarity, null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = Exprs.cosineSim(a, b)

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

  /** Train the IVF coarse quantizer: k-means centroids over (a sample of)
    * the corpus. At 100 TB you fit on a ~1M-row sample — the quantizer
    * quality barely moves past that; here the corpus is small enough to
    * fit on everything. Deterministic via fixed seed. */
  def fitCentroids(corpus: DataFrame, nlist: Int, vecCol: String = "embedding",
                   seed: Long = 42L, maxIter: Int = 10): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter).fit(feats)
      .clusterCenters.map(_.toArray)
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
}
