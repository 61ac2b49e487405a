package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Greenwald-Khanna quantile summary (GK, SIGMOD '01) as a KEYED
  * mergeable Aggregator — per-group rank-error-bounded quantiles in ONE
  * pass, the per-source drift-monitoring primitive (q89's TVD compares
  * distributions over FIXED buckets; per-source quantile edges are how
  * those buckets stay comparable as sources drift).
  *
  * The summary is a sorted list of tuples (v_i, g_i, Δ_i) with
  * rmin_i = Σ_{j≤i} g_j and rmax_i = rmin_i + Δ_i bracketing v_i's true
  * rank; the maintained invariant max_i (g_i + Δ_i) ≤ 2εn makes any
  * quantile answerable to within εn ranks from ~(1/ε)·log(εn) tuples.
  *
  * Mergeability is the load-bearing property at 100 TB and the reason
  * this is an Aggregator (the KmvAgg/MisraGriesAgg discipline): rank
  * UNCERTAINTY adds absolutely under merge (Agarwal et al.,
  * "Mergeable Summaries", PODS '12) — a tuple taken from summary A gets
  * Δ' = Δ_a + (g_b + Δ_b − 1) of the next unconsumed B tuple (its
  * position among B's values is uncertain by exactly B's local gap), so
  * merged gaps are ≤ 2εn_a + 2εn_b = 2εn and ε survives ARBITRARY merge
  * trees — each task reduces every group it sees to one bounded
  * summary, partials merge map-side, and the shuffle carries summaries,
  * never values. Raw inserts buffer in a head array and flush as an
  * EXACT mini-summary (g=1, Δ=0) through the same merge path — one code
  * path, and the flush batch adds at most +1 to any gap (absorbed, with
  * R-7 interpolation off-by-ones, by the certificate's doubled slack —
  * the q45 discipline).
  *
  * Like q45/q43/q66, the sketch VALUE is an actual data element and
  * engine-specific, so the oracle pins exact quantiles plus TRUE
  * certificate booleans; at scale you run only the sketch aggregate.
  */
object Gk {

  private val HeadCap = 1024

  /** Mutable GK summary; Kryo round-trips between partials (arrays and
    * scalars only — no boxed structure). */
  final class Summary(val eps: Double) extends Serializable {
    var n: Long = 0L
    var size: Int = 0
    var vs: Array[Double] = Array.empty
    var gs: Array[Long] = Array.empty
    var ds: Array[Long] = Array.empty
    var head: Array[Double] = new Array[Double](HeadCap)
    var headLen: Int = 0

    def insert(v: Double): Unit = {
      head(headLen) = v
      headLen += 1
      if (headLen == head.length) flush()
    }

    /** Drain the head buffer: sort it into an exact mini-summary and
      * merge through the one merge path. */
    def flush(): Unit = {
      if (headLen == 0) return
      val batch = java.util.Arrays.copyOf(head, headLen)
      java.util.Arrays.sort(batch)
      val bGs = Array.fill(headLen)(1L)
      val bDs = new Array[Long](headLen)
      mergeLists(batch, bGs, bDs, headLen)
      n += headLen
      headLen = 0
      compress()
    }

    /** Interleave another sorted tuple list into this one with the
      * rank-uncertainty merge rule (see object doc). Does NOT touch n —
      * callers account for it. */
    private def mergeLists(oVs: Array[Double], oGs: Array[Long],
                           oDs: Array[Long], oSize: Int): Unit = {
      val mVs = new Array[Double](size + oSize)
      val mGs = new Array[Long](size + oSize)
      val mDs = new Array[Long](size + oSize)
      var ai = 0
      var bi = 0
      var mi = 0
      while (ai < size || bi < oSize) {
        val takeA = bi >= oSize || (ai < size && vs(ai) <= oVs(bi))
        if (takeA) {
          mVs(mi) = vs(ai); mGs(mi) = gs(ai)
          mDs(mi) = gs(ai) match {
            case _ if bi < oSize => ds(ai) + (oGs(bi) + oDs(bi) - 1)
            case _ => ds(ai)
          }
          ai += 1
        } else {
          mVs(mi) = oVs(bi); mGs(mi) = oGs(bi)
          mDs(mi) =
            if (ai < size) oDs(bi) + (gs(ai) + ds(ai) - 1)
            else oDs(bi)
          bi += 1
        }
        mi += 1
      }
      vs = mVs; gs = mGs; ds = mDs; size = mi
    }

    /** Fold tuple i into i+1 while the combined gap stays under 2εn;
      * endpoints are never folded (exact min/max keep p=0 and p=1
      * answerable). */
    private def compress(): Unit = {
      if (size <= 2) return
      val t = math.floor(2.0 * eps * n).toLong
      var w = size - 1 // write cursor walking down; fold into the right
      var i = size - 2
      while (i >= 1) {
        if (gs(i) + gs(w) + ds(w) <= t) {
          gs(w) += gs(i)
        } else {
          w -= 1
          vs(w) = vs(i); gs(w) = gs(i); ds(w) = ds(i)
        }
        i -= 1
      }
      w -= 1
      vs(w) = vs(0); gs(w) = gs(0); ds(w) = ds(0)
      if (w > 0) {
        size = size - w
        System.arraycopy(vs, w, vs, 0, size)
        System.arraycopy(gs, w, gs, 0, size)
        System.arraycopy(ds, w, ds, 0, size)
      }
    }

    def mergeWith(o: Summary): Summary = {
      flush(); o.flush()
      mergeLists(o.vs, o.gs, o.ds, o.size)
      n += o.n
      compress()
      this
    }

    /** A value whose rank is within ~εn of ceil(p·n); NaN when empty. */
    def query(p: Double): Double = {
      flush()
      if (n == 0 || size == 0) return Double.NaN
      val r = math.max(1L, math.ceil(p * n).toLong)
      val allow = math.floor(eps * n).toLong
      var rmin = 0L
      var i = 0
      while (i < size) {
        rmin += gs(i)
        if (rmin + ds(i) > r + allow) return vs(math.max(i - 1, 0))
        i += 1
      }
      vs(size - 1)
    }
  }

  class GkAgg(eps: Double, ps: Seq[Double])
      extends Aggregator[Double, Summary, Array[Double]] {
    override def zero: Summary = new Summary(eps)
    override def reduce(b: Summary, v: Double): Summary = { b.insert(v); b }
    override def merge(a: Summary, b: Summary): Summary = a.mergeWith(b)
    override def finish(s: Summary): Array[Double] = ps.map(s.query).toArray
    override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    override def outputEncoder: Encoder[Array[Double]] =
      Encoders.kryo[Array[Double]]
  }

  /** [[GkAgg]] that finishes with the SUMMARY ITSELF as positional
    * tuples (idx, v, g, Δ) — the persistable form a streaming ledger
    * lands per batch ([[graft.streaming.StreamGk]]); [[fromTuples]]
    * rebuilds the summary for later merging. */
  class GkSummaryAgg(eps: Double)
      extends Aggregator[Double, Summary, Seq[(Int, Double, Long, Long)]] {
    override def zero: Summary = new Summary(eps)
    override def reduce(b: Summary, v: Double): Summary = { b.insert(v); b }
    override def merge(a: Summary, b: Summary): Summary = a.mergeWith(b)
    override def finish(s: Summary): Seq[(Int, Double, Long, Long)] = {
      s.flush()
      (0 until s.size).map(i => (i, s.vs(i), s.gs(i), s.ds(i)))
    }
    override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
    override def outputEncoder: Encoder[Seq[(Int, Double, Long, Long)]] =
      Encoders.kryo[Seq[(Int, Double, Long, Long)]]
  }

  /** Rebuild a summary from its positional tuples (n = Σg — g mass IS
    * the count by construction). Tuples must arrive in index order. */
  def fromTuples(eps: Double, tuples: Seq[(Double, Long, Long)]): Summary = {
    val s = new Summary(eps)
    s.size = tuples.length
    s.vs = tuples.map(_._1).toArray
    s.gs = tuples.map(_._2).toArray
    s.ds = tuples.map(_._3).toArray
    s.n = s.gs.sum
    s
  }

  /** Per-group GK quantiles from the sketch alone: one row per
    * (group, p) with the sketch's answer. The production form at scale
    * — values never shuffle, each group's summary is bounded. */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double], eps: Double = 0.005): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("x"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new GkAgg(eps, ps).toColumn.name("qs"))
      .flatMap { case (g, qs) =>
        ps.indices.map(i => (g, ps(i), qs(i)))
      }
      .toDF(groupCol, "p", "gk_q")
  }

  /** Certification of [[groupedQuantiles]] (the q45/q43/q66 discipline):
    * per (group, p), the EXACT R-7 quantile plus a boolean asserting
    * the sketch's answer landed between the exact quantiles at
    * p ± 2ε — doubled slack absorbing interpolation off-by-ones at the
    * rank boundary and the flush batch's +1 gap. The oracle replays the
    * exact values and pins `ok` TRUE; the sketch value itself is an
    * engine-specific data element and never crosses engines. */
  def groupedQuantilesCertified(df: DataFrame, groupCol: String,
                                valueCol: String,
                                ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                                eps: Double = 0.005): DataFrame = {
    val slack = 2.0 * eps
    val lo = ps.map(p => math.max(0.0, p - slack))
    val hi = ps.map(p => math.min(1.0, p + slack))
    val probes = ps ++ lo ++ hi
    val k = ps.length
    def at(off: Int) = element_at(col("ex"), col("pos") + 1 + off)
    val exact = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(percentile(col(valueCol).cast("double"),
        array(probes.map(lit): _*)).as("ex"))
      .select(col(groupCol),
        explode(sequence(lit(0), lit(k - 1))).as("pos"), col("ex"))
      .select(col(groupCol),
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        (floor(at(0) * 100 + 0.5) / 100.0).as("q"),
        at(k).as("_lo"), at(2 * k).as("_hi"))
    exact
      .join(groupedQuantiles(df, groupCol, valueCol, ps, eps),
        Seq(groupCol, "p"))
      .select(col(groupCol), col("p"), col("q"),
        (col("gk_q") >= col("_lo") && col("gk_q") <= col("_hi")).as("ok"))
  }

  /** [[groupedQuantilesCertified]] with a RANK-COUNTED certificate —
    * the form that stays provably true for arbitrarily SMALL groups
    * (per-window quantiles: a (source, day) cell can hold tens of
    * rows, where the interpolated p±2ε value window can sit strictly
    * between adjacent order statistics and fail spuriously). Here the
    * sketch's answer is joined back to the data and its TRUE rank
    * interval [#{x < q}+1, #{x ≤ q}] is counted per group; `ok`
    * asserts it intersects [r − a, r + a] for target rank
    * r = max(1, ⌈p·n⌉) and allowance a = ⌊2εn⌋ + 2 — the GK guarantee
    * (εn) doubled plus the flush/merge off-by-ones, exact integer
    * arithmetic throughout. The oracle replays the exact quantiles and
    * pins `ok` TRUE; cost over the plain sketch is one extra counting
    * pass (broadcast of groups × ps sketch answers), which is the
    * price of certification, not of production use. */
  def groupedQuantilesCertifiedByRank(df: DataFrame, groupCol: String,
                                      valueCol: String,
                                      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                                      eps: Double = 0.005): DataFrame = {
    val k = ps.length
    val base = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as(groupCol),
        col(valueCol).cast("double").as("x"))
    val exact = base
      .groupBy(col(groupCol))
      .agg(percentile(col("x"), array(ps.map(lit): _*)).as("ex"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        explode(sequence(lit(0), lit(k - 1))).as("pos"), col("ex"))
      .select(col(groupCol), col("n"), col("pos").cast("long").as("pos"),
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        (floor(element_at(col("ex"), col("pos") + 1) * 100 + 0.5) / 100.0)
          .as("q"))
    val sk = groupedQuantiles(df, groupCol, valueCol, ps, eps)
    val ranks = base
      .join(broadcast(sk), Seq(groupCol))
      .groupBy(col(groupCol), col("p"), col("gk_q"))
      .agg(sum(when(col("x") < col("gk_q"), 1L).otherwise(0L)).as("_lt"),
        sum(when(col("x") <= col("gk_q"), 1L).otherwise(0L)).as("_le"))
    // `pos` (p's integer index) rides along so row identity is carried
    // by non-float columns — float columns are excluded from the
    // driver's row-alignment sort, and four same-group rows would
    // otherwise align arbitrarily
    exact
      .join(ranks, Seq(groupCol, "p"))
      .withColumn("_r", greatest(lit(1L), ceil(col("p") * col("n"))))
      .withColumn("_a", floor(lit(2.0 * eps) * col("n")) + 2L)
      .select(col(groupCol), col("pos"), col("p"), col("q"),
        (col("_lt") + 1L <= col("_r") + col("_a") &&
          col("_le") >= col("_r") - col("_a")).as("ok"))
  }
}
