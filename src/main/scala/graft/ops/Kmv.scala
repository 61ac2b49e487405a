package graft.ops

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

  /** Mutable bounded sketch buffer: a max-HEAP of the kept hashes
    * (heap(0) = current k-th minimum; O(log k) replace-max with ZERO
    * per-row allocation) plus an open-addressing hash TABLE over the
    * same values (O(1) dedup — KMV keeps the k smallest DISTINCT
    * hashes, so every insert must dedup). Replaces the round-9
    * immutable TreeSet buffer, whose per-row boxed persistent-set
    * allocation was the only non-scan cost on the sketch family's
    * highest-volume path (VERDICT r9 watch-item). The kept SET is a
    * pure function of the input set either way — the oracle-replayed
    * sketch value is structure-independent.
    *
    * Hashes are 48-bit non-negative, so -1/-2 serve as empty/tombstone
    * sentinels. Table capacity is a power of two ≥ 4k: live load ≤ 1/4,
    * and a rebuild fires when tombstones (from replace-max deletions)
    * exceed 1/4 — probes stay O(1) under descending-order churn. */
  final class KmvBuffer(val k: Int) extends Serializable {
    private val Empty = -1L
    private val Tomb = -2L
    var heap: Array[Long] = new Array[Long](math.max(k, 1))
    var size: Int = 0
    var table: Array[Long] = {
      var c = 8
      while (c < 4 * k) c <<= 1
      Array.fill(c)(Empty)
    }
    var tombs: Int = 0

    private def slotOf(h: Long): Int = {
      val z = h * -7046029254386353131L // Stafford mix constant
      ((z ^ (z >>> 32)).toInt) & (table.length - 1)
    }

    def insert(h: Long): Unit = {
      if (size == k && h >= heap(0)) return // >= max: full dup or too big
      val mask = table.length - 1
      var idx = slotOf(h)
      var firstTomb = -1
      var slot = -1
      while (slot < 0) {
        val t = table(idx)
        if (t == h) return // duplicate
        else if (t == Empty) slot = if (firstTomb >= 0) firstTomb else idx
        else {
          if (t == Tomb && firstTomb < 0) firstTomb = idx
          idx = (idx + 1) & mask
        }
      }
      if (table(slot) == Tomb) tombs -= 1
      table(slot) = h
      if (size < k) {
        // heap-push
        heap(size) = h
        var i = size
        size += 1
        while (i > 0 && heap((i - 1) >> 1) < heap(i)) {
          val p = (i - 1) >> 1
          val tmp = heap(p); heap(p) = heap(i); heap(i) = tmp
          i = p
        }
      } else {
        // replace-max: update the HEAP first, THEN tombstone the old max
        // — unsetTable can trigger a table rebuild, and the rebuild
        // reads the heap as ground truth; tombstoning first would
        // resurrect the old max and drop h from the rebuilt table
        // (corrupting dedup and making a later unsetTable(h) probe spin)
        val old = heap(0)
        heap(0) = h
        var i = 0
        var go = true
        while (go) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < size && heap(l) > heap(m)) m = l
          if (r < size && heap(r) > heap(m)) m = r
          if (m == i) go = false
          else {
            val tmp = heap(m); heap(m) = heap(i); heap(i) = tmp
            i = m
          }
        }
        unsetTable(old)
      }
    }

    private def unsetTable(h: Long): Unit = {
      val mask = table.length - 1
      var idx = slotOf(h)
      while (table(idx) != h) idx = (idx + 1) & mask
      table(idx) = Tomb
      tombs += 1
      if (tombs > table.length / 4) rebuildTable()
    }

    private def rebuildTable(): Unit = {
      java.util.Arrays.fill(table, Empty)
      tombs = 0
      val mask = table.length - 1
      var i = 0
      while (i < size) {
        var idx = slotOf(heap(i))
        while (table(idx) != Empty) idx = (idx + 1) & mask
        table(idx) = heap(i)
        i += 1
      }
    }

    def absorb(o: KmvBuffer): Unit = {
      var i = 0
      while (i < o.size) { insert(o.heap(i)); i += 1 }
    }

    def toSortedArray: Array[Long] = {
      val out = java.util.Arrays.copyOf(heap, size)
      java.util.Arrays.sort(out)
      out
    }
  }

  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuffer, Array[Long]] {
    override def zero: KmvBuffer = new KmvBuffer(k)
    override def reduce(b: KmvBuffer, h: Long): KmvBuffer = { b.insert(h); b }
    override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
      if (a.size >= b.size) { a.absorb(b); a } else { b.absorb(a); b }
    override def finish(r: KmvBuffer): Array[Long] = r.toSortedArray
    override def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
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
  /** Per-group sketch frame: (g, v) rows, ≤ k per group — the keyed
    * form of [[sketch]], shared by the grouped estimate and the
    * source-overlap matrix. */
  private[ops] def groupedSketch(df: DataFrame, groupCol: String,
                                 colName: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(colName).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(colName)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvAgg(k).toColumn.name("sk"))
      .flatMap { case (g, arr) => arr.map(v => (g, v)) }
      .toDF("g", "v")
  }

  def groupedCertifiedEstimate(df: DataFrame, groupCol: String,
                               colName: String, k: Int): DataFrame = {
    val kept = groupedSketch(df, groupCol, colName, k)
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

  /** Cross-source content-overlap matrix at SKETCH volume — the scale
    * twin of [[Dedup.sourceOverlapMatrix]] (q158). q158's exact
    * postings rollup is pair-volume-bounded by df caps; this form
    * reduces each source's distinct word-2-gram shingle set to a k-long
    * KMV sketch and reads every pairwise overlap from the sketches
    * alone via the [[setEstimates]] θ rule — per unordered source pair:
    * θ = min(θ_a, θ_b), n_common = shared hashes below θ, est_inter =
    * n_common · 2^48 div θ. Cost is one corpus scan plus
    * O(sources² + sources·k) driver-free arithmetic, for ARBITRARILY
    * many sources; under-full sketches degenerate to exact overlap.
    *
    * Every value is deterministic (the q154 discipline: md5-derived
    * k-minima, integer formulas), so the oracle replays the sketch
    * VALUES, θ, the common counts, AND the exact per-source/-pair
    * distinct-shingle counts carried for certification. Pairs with no
    * shared kept hash still appear (n_common 0) — a mixture plan needs
    * the full matrix, including "no measured overlap". */
  def sourceOverlapSketch(documents: DataFrame, k: Int = 256): DataFrame = {
    val sh = documents
      .where(col("text").isNotNull && col("source").isNotNull)
      .select(col("source").cast("string").as("g"),
        explode(graft.expr.Exprs.shingleStrings(col("text"), 2)).as("s"))
    // sketch feeds thetas AND the pairwise-common join; distinct feeds
    // the two exact certification aggregates — materialize each once
    val sk = groupedSketch(sh, "g", "s", k).localCheckpoint(true)
    val ds = sh.distinct().localCheckpoint(true)
    val th = sk.groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("v")).as("_h"))
      .withColumn("theta",
        when(col("n_kept") < k, lit(HashSpace)).otherwise(col("_h") + 1L))
      .select(col("g"), col("n_kept"), col("theta"))
    val pairs = th
      .select(col("g").as("source_a"), col("n_kept").as("kept_a"),
        col("theta").as("_ta"))
      .crossJoin(th.select(col("g").as("source_b"),
        col("n_kept").as("kept_b"), col("theta").as("_tb")))
      .where(col("source_a") < col("source_b"))
      .withColumn("theta", least(col("_ta"), col("_tb")))
      .drop("_ta", "_tb")
    // shared kept hashes below θ: the sketch self-join is bounded by
    // sources·k rows a side
    val common = sk.select(col("g").as("source_a"), col("v"))
      .join(sk.select(col("g").as("source_b"), col("v")), Seq("v"))
      .where(col("source_a") < col("source_b"))
      .join(broadcast(pairs.select(col("source_a"), col("source_b"),
        col("theta").as("_t"))), Seq("source_a", "source_b"))
      .where(col("v") < col("_t"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    val exactPer = ds.groupBy(col("g")).agg(count(lit(1)).as("exact_n"))
    val exactPair = ds.select(col("g").as("source_a"), col("s"))
      .join(ds.select(col("g").as("source_b"), col("s")), Seq("s"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(common, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_common"))
      .withColumn("est_inter",
        expr(s"(n_common * ${HashSpace}L) div theta"))
      .join(broadcast(exactPer.select(col("g").as("source_a"),
        col("exact_n").as("exact_a"))), Seq("source_a"))
      .join(broadcast(exactPer.select(col("g").as("source_b"),
        col("exact_n").as("exact_b"))), Seq("source_b"))
      .join(exactPair, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .select(col("source_a"), col("source_b"), col("kept_a"),
        col("kept_b"), col("theta"), col("n_common"), col("est_inter"),
        col("exact_a"), col("exact_b"), col("exact_inter"))
  }
}
