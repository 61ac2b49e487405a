package graft.ops

import scala.collection.immutable.TreeSet
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the DETERMINISTIC
  * cardinality estimator the HLL path (Relational.approxDistinctCounts,
  * q43) cannot be: HLL register layouts are engine-specific, so q43 only
  * certifies error bounds; KMV's state is "the k smallest hash values",
  * a pure function of the input set that any engine replays bit-for-bit.
  * The driver's DuckDB oracle recomputes the identical sketch and the
  * identical estimate (q154) — a sketch whose VALUE is hash-checkable,
  * not just bound-checkable.
  *
  * Estimator (Bar-Yossef et al. '02; Beyer et al. '07 unbiased form):
  * with hashes uniform on [0, 2^48), the k-th smallest hash h_k gives
  *   distinct ≈ (k−1) · 2^48 / (h_k + 1)
  * (the +1 maps to U = (h+1)/2^48 ∈ (0,1], dodging h=0 division). When
  * fewer than k distinct hashes exist the sketch IS the distinct set and
  * the count is exact. Integer division both engines floor identically;
  * (k−1)·2^48 fits a BIGINT for k ≤ 2^15.
  *
  * Hash: the first 12 hex chars of md5 of the value's canonical string
  * form (`conv(,16,10)` here; positional strpos/power fold in DuckDB —
  * lexicographic hex order == numeric order, both engines see the same
  * 48-bit integers). 48 bits keeps every product in BIGINT range; at
  * k=4096 the birthday-collision bias at 2^48 is ~k²/2^49 ≪ the
  * estimator's own 1/√k error.
  *
  * Shape at scale: a mergeable typed Aggregator (the Misra-Gries q66
  * discipline) — each partition reduces to ≤ k longs, partials merge
  * map-side, and the shuffle carries k·#tasks longs no matter the input
  * cardinality. Union cardinality = merge the per-source sketches
  * ([[mergeSketches]]) — no re-scan of either source.
  */
object Kmv {

  /** 2^48 — the hash space size. */
  val HashSpace: Long = 1L << 48

  /** 48-bit hash: first 12 hex chars of md5(canonical string), as long. */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** Keep the k smallest DISTINCT hash values; TreeSet.max is the
    * current k-th minimum, dropped first on overflow. */
  private[ops] def trim(s: TreeSet[Long], k: Int): TreeSet[Long] = {
    var m = s
    while (m.size > k) m -= m.max
    m
  }

  class KmvAgg(k: Int) extends Aggregator[Long, TreeSet[Long], Array[Long]] {
    override def zero: TreeSet[Long] = TreeSet.empty[Long]
    override def reduce(b: TreeSet[Long], h: Long): TreeSet[Long] =
      if (b.contains(h)) b
      else if (b.size < k) b + h
      else if (h < b.max) trim(b + h, k)
      else b
    override def merge(a: TreeSet[Long], b: TreeSet[Long]): TreeSet[Long] =
      trim(a ++ b, k)
    override def finish(r: TreeSet[Long]): Array[Long] = r.toArray
    override def bufferEncoder: Encoder[TreeSet[Long]] =
      Encoders.kryo[TreeSet[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
  }

  /** The sketch of a column: ≤ k rows of kept hash values (`v`). */
  def sketch(df: DataFrame, colName: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(colName).isNotNull)
      .select(hash48(col(colName)).as("h")).as[Long]
      .groupByKey(_ => 0) // one global sketch; partials merge map-side
      .agg(new KmvAgg(k).toColumn.name("sk"))
      .flatMap(_._2)
      .toDF("v")
  }

  /** Sketch union — KMV merges EXACTLY: trim(kmv(A) ∪ kmv(B)) is the
    * sketch of A ∪ B (spec-pinned), so union cardinality needs no
    * re-scan. Distinct-then-trim via one ≤ 2k-row sort. */
  def mergeSketches(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).distinct().orderBy(col("v")).limit(k)

  /** Estimate from a sketch frame: one row (n_kept, kth_hash,
    * est_distinct). */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n_kept"), max(col("v")).as("kth_hash"))
      .withColumn("est_distinct", estCol(k))

  /** The estimate expression over (n_kept, kth_hash) columns — shared by
    * the global, grouped, and streaming paths so the formula exists
    * once. */
  private def estCol(k: Int): Column =
    when(col("n_kept") < k, col("n_kept"))
      .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div (kth_hash + 1L)"))

  /** Grouped distinct estimation — "distinct users per event type" at
    * 100 TB without shuffling user ids: each task reduces every group it
    * sees to ≤ k longs, partials merge map-side, and the shuffle carries
    * ≤ k·#groups·#tasks longs (vs. the exact form's every distinct
    * (group, value) pair). One row per group with the q154 estimate
    * fields plus the exact count for certification. */
  def groupedCertifiedEstimate(df: DataFrame, groupCol: String,
                               colName: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val kept = df.where(col(colName).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(colName)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvAgg(k).toColumn.name("sk"))
      .flatMap { case (g, arr) => arr.map(v => (g, v)) }
      .toDF("g", "v")
    val est = kept.groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("v")).as("kth_hash"))
      .withColumn("est_distinct", estCol(k))
    val exact = df.where(col(colName).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(countDistinct(col(colName)).cast("long").as("exact_distinct"))
    est.join(exact, Seq("g")).withColumnRenamed("g", groupCol)
  }

  /** Theta-style set-operation cardinality (the DataSketches use case;
    * Dasgupta et al. '16): union AND intersection distinct counts of two
    * populations from their k-long sketches alone — no re-scan, no exact
    * distinct of either side.
    *
    *   θ_X   = h_k^X + 1 when sketch X is full, else 2^48 ("kept all")
    *   θ     = min(θ_A, θ_B)   — both kept sets are complete below θ
    *   union = estimate(trim(A ∪ B, k))        (plain KMV merge)
    *   inter = |{v ∈ A ∩ B : v < θ}| · 2^48 div θ
    *
    * The intersection formula is uniform: under-full sketches have
    * θ = 2^48 so it degenerates to the exact count of common hashes.
    * Every quantity is a BIGINT both engines replay (cnt ≤ k, so
    * cnt·2^48 fits for k ≤ 2^15). One row: kept sizes, θ, both
    * estimates, and the exact counterparts for certification. */
  def setEstimates(dfA: DataFrame, colA: String,
                   dfB: DataFrame, colB: String, k: Int): DataFrame = {
    // each sketch feeds three consumers (union merge, θ, intersection);
    // eager-materialize the ≤ k rows so each input is scanned+hashed
    // once, not three times
    val skA = sketch(dfA, colA, k).localCheckpoint(true)
    val skB = sketch(dfB, colB, k).localCheckpoint(true)
    def thetaOf(sk: DataFrame, name: String): DataFrame =
      sk.agg(count(lit(1)).as(s"n_$name"), max(col("v")).as("_h"))
        .withColumn(s"theta_$name",
          when(col(s"n_$name") < k, lit(HashSpace))
            .otherwise(col("_h") + 1L))
        .drop("_h")
    val unionEst = estimate(mergeSketches(skA, skB, k), k)
      .select(col("est_distinct").as("est_union"))
    val thetas = thetaOf(skA, "a").crossJoin(thetaOf(skB, "b"))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .select(col("n_a"), col("n_b"), col("theta"))
    // ≤ k common hashes × 1 theta row — bounded both sides
    val nCommon = skA.join(skB, Seq("v"))
      .crossJoin(thetas.select(col("theta").as("_t")))
      .where(col("v") < col("_t"))
      .agg(count(lit(1)).as("n_common"))
    val estInter = thetas.crossJoin(nCommon)
      .withColumn("est_inter",
        expr(s"(n_common * ${HashSpace}L) div theta"))
      .select(col("n_a"), col("n_b"), col("theta"), col("est_inter"))
    val exact = {
      val a = dfA.where(col(colA).isNotNull).select(col(colA).as("x")).distinct()
      val b = dfB.where(col(colB).isNotNull).select(col(colB).as("x")).distinct()
      a.union(b).distinct().agg(count(lit(1)).as("exact_union"))
        .crossJoin(a.join(b, Seq("x"))
          .agg(count(lit(1)).as("exact_inter")))
    }
    estInter.crossJoin(unionEst).crossJoin(exact)
  }

  /** N-way intersection cardinality — the [[setEstimates]] θ rule
    * generalized: θ = min over ALL sketches' thresholds (every kept set
    * is complete below it), the candidate set is the values present in
    * EVERY sketch below θ, and the estimate scales by 2^48/θ with the
    * same exact under-full degenerate. "Users in segment A ∩ B ∩ C"
    * from three k-long sketches, no re-scan of any side. */
  def multiIntersection(inputs: Seq[(DataFrame, String)],
                        k: Int): DataFrame = {
    require(inputs.size >= 2, "need at least two sets")
    val sks = inputs.map { case (df, c) =>
      sketch(df, c, k).localCheckpoint(true) // ≤ k rows, read 2–3 times
    }
    val thetas = sks.zipWithIndex.map { case (sk, i) =>
      sk.agg(count(lit(1)).as(s"n_$i"), max(col("v")).as("_h"))
        .withColumn(s"theta_$i",
          when(col(s"n_$i") < k, lit(HashSpace)).otherwise(col("_h") + 1L))
        .select(col(s"n_$i"), col(s"theta_$i"))
    }.reduce(_.crossJoin(_))
      .withColumn("theta",
        least(inputs.indices.map(i => col(s"theta_$i")): _*))
    val common = sks.reduce((a, b) => a.join(b, Seq("v")))
    val nCommon = common
      .crossJoin(thetas.select(col("theta").as("_t")))
      .where(col("v") < col("_t"))
      .agg(count(lit(1)).as("n_common"))
    val exact = inputs.map { case (df, c) =>
      df.where(col(c).isNotNull).select(col(c).as("x")).distinct()
    }.reduce(_.join(_, Seq("x")))
      .agg(count(lit(1)).as("exact_inter"))
    thetas.select(inputs.indices.map(i => col(s"n_$i")) :+ col("theta"): _*)
      .crossJoin(nCommon)
      .withColumn("est_inter",
        expr(s"(n_common * ${HashSpace}L) div theta"))
      .crossJoin(exact)
  }

  /** Certification query (q154): the sketch estimate NEXT TO the exact
    * distinct count, both oracle-replayable. The exact side is the
    * certification's cost, not the operator's — production callers run
    * [[sketch]]/[[estimate]] alone (one pass, k longs of state). */
  def certifiedEstimate(df: DataFrame, colName: String, k: Int): DataFrame = {
    val est = estimate(sketch(df, colName, k), k)
    val exact = df.where(col(colName).isNotNull)
      .agg(countDistinct(col(colName)).cast("long").as("exact_distinct"))
    est.crossJoin(exact)
  }
}
