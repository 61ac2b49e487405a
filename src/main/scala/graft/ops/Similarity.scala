package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB design requires:
  *  - brute-force cosine top-k — the exact baseline. Queries are a small
  *    broadcast side; the corpus streams once; per-query top-k is a
  *    window-ranked aggregation (at extreme scale: per-partition heaps via
  *    TakeOrdered semantics; the cross product is |corpus| x |queries|,
  *    linear in the corpus for a fixed query batch).
  *  - hyperplane LSH (Charikar '02 random projections): each vector hashes
  *    to a `planes`-bit bucket; search joins query buckets to corpus
  *    buckets — the scan becomes an equi-join on bucket, sub-linear in
  *    practice, recall tuned by planes count and multi-probe.
  *
  * The dot product / cosine are built-in higher-order functions
  * (`zip_with` + `aggregate`) on doubles — no UDF, fully distributed; a
  * codegen'd Catalyst Expression is the next optimization if profiling
  * shows the HOF interpreter dominating.
  */
object Similarity {

  /** Elementwise dot product of two array<double>/array<float> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity, null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b) / (norm(a) * norm(b))
    when(norm(a) === 0 || norm(b) === 0, lit(null)).otherwise(d)
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

  /** Deterministic pseudo-random unit-ish hyperplanes: component j of plane
    * p derives from a splitmix-style integer mix of (p, j) — reproducible
    * across sessions with zero data movement. Returns array of planes,
    * each array<double> of length `dim`. */
  private def planeComponent(p: Column, j: Column): Column = {
    // integer mix -> [-1, 1): ((mix >>> 11) / 2^52) * 2 - 1
    val mixed = call_function("xxhash64", p * 1000003 + j)
    (call_function("shiftrightunsigned", mixed, lit(11)).cast("double")
      / lit(4503599627370496.0)) * 2.0 - 1.0
  }

  /** `planes`-bit LSH bucket of a vector: bit p = sign(v . plane_p). */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), lit(dim - 1)),
            (x, j) => x.cast("double") * planeComponent(p, j)),
          lit(0.0), (s, v) => s + v)
        acc.bitwiseOR(when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(0L))
      })

  /** Attach an LSH bucket column (named `bucket`) to a vector table. */
  def withBucket(df: DataFrame, vecCol: String, planes: Int = 12): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    df.withColumn("bucket", lshBucket(col(vecCol), planes, dim))
  }

  /** Approximate top-k: exact ranking restricted to same-bucket candidates.
    * Lower `planes` => bigger buckets => higher recall & cost. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int = 5, planes: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), planes, dim)))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("bucket", lshBucket(col("nvec"), planes, dim))
    val scored = c.join(q, Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
  }
}
