package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-statistics collection — the ANALYZE pass an optimizer (or a human
  * sizing a 100 TB job) runs before choosing join orders and broadcast
  * sides. One scan computes (count, nulls, min, max) for every requested
  * column simultaneously: a single aggregate over 4xN expressions, then an
  * in-row unpivot (posexplode of a struct array) to one tidy row per
  * column. No per-column scans, no shuffle beyond the single-row
  * aggregate's reduce. NDV estimation is deliberately not duplicated here —
  * that's the HLL sketch path (Relational.approxDistinctCounts, q43).
  */
object Stats {

  /** Per-column stats over numeric columns, one scan. min/max surface as
    * double (exact for ints up to 2^53 and for parquet float/double data;
    * engine-portable for the oracle). */
  def numericColumnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"nulls_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val packed = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"n_$c").as("n_nonnull"),
      col(s"nulls_$c").as("n_null"),
      col(s"min_$c").as("min_d"),
      col(s"max_$c").as("max_d"))): _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(packed).as("s"))
      .select(col("s.column"), col("s.n_nonnull"), col("s.n_null"),
        col("s.min_d"), col("s.max_d"))
  }

  /** String-column twin of [[numericColumnStats]]: (count, nulls, min,
    * max, max length) per column, one scan. Binary-collation min/max —
    * the same total order DuckDB's default collation uses, so the output
    * is oracle-comparable. */
  def stringColumnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"nulls_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        max(length(col(c))).cast("long").as(s"len_$c"))
    }
    val packed = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"n_$c").as("n_nonnull"),
      col(s"nulls_$c").as("n_null"),
      col(s"min_$c").as("min_s"),
      col(s"max_$c").as("max_s"),
      col(s"len_$c").as("max_len"))): _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(packed).as("s"))
      .select(col("s.column"), col("s.n_nonnull"), col("s.n_null"),
        col("s.min_s"), col("s.max_s"), col("s.max_len"))
  }

  // ------------------------------------------------- exact quantiles

  /** Exact interpolated quantiles (type R-7, the `percentile` /
    * `quantile_cont` definition) by DISTRIBUTED selection: range-partition
    * the values, count each partition (bounded collect: `parts` longs),
    * locate which partition holds each needed order statistic, then pull
    * exactly those ranks with a streaming per-partition scan over the
    * locally-sorted cache. Nothing ever funnels through one node: the
    * biggest single-task unit is one range partition's local sort.
    *
    * This replaces Spark's built-in `percentile` aggregate for q86, whose
    * final merge materializes EVERY distinct value in one aggregation
    * buffer on one task — fine at sf0.1 (~0.5M doubles), an OOM at 100 TB
    * of near-continuous values (billions of distinct doubles in one heap).
    *
    * Interpolation mirrors Percentile.getPercentile exactly
    * ((hi-h)*v0 + (h-lo)*v1), and bucket assignment downstream is immune
    * to last-ulp interpolation differences anyway: a boundary interpolated
    * strictly between adjacent order statistics v0 < v1 has NO data value
    * between the two engines' versions of it, so `x > boundary` agrees.
    *
    * Driver traffic is bounded by design: `parts` counts + 2·|ps| order
    * statistics — never data. NULL and NaN values are excluded (the
    * `quantile_cont` convention). Returns NaN for every p when the column
    * is empty. */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                     parts: Int = 64): Array[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    val vals = df.select(col(valueCol).cast("double").as("x"))
      .where(col("x").isNotNull && !isnan(col("x")))
    val ranged = vals.repartitionByRange(parts, col("x"))
      .sortWithinPartitions("x").persist()
    try {
      val perPart = ranged.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          // Long accumulator, not Iterator.size: size returns Int and would
          // silently wrap past 2^31 rows in one range partition.
          var c = 0L
          while (it.hasNext) { it.next(); c += 1L }
          Iterator.single((pid, c))
        }
        .collect().sortBy(_._1).map(_._2)
      val n = perPart.sum
      if (n == 0) return ps.map(_ => Double.NaN).toArray
      // 0-based order-statistic indexes each quantile interpolates between;
      // h = p * (n-1) is the same double expression both engines evaluate
      val needs = ps.map { p =>
        val h = p * (n - 1)
        (p, h, math.floor(h).toLong, math.min(math.ceil(h).toLong, n - 1))
      }
      val offsets = perPart.scanLeft(0L)(_ + _) // rows before partition pid
      def locate(k: Long): (Int, Long) = {
        var pid = 0
        while (pid + 1 < perPart.length && offsets(pid + 1) <= k) pid += 1
        (pid, k - offsets(pid))
      }
      val wanted: Map[Int, Seq[(Long, Long)]] = // pid -> (localIdx, globalIdx)
        needs.flatMap(t => Seq(t._3, t._4)).distinct
          .map(k => (locate(k), k))
          .groupBy(_._1._1)
          .map { case (pid, xs) =>
            pid -> xs.map(x => (x._1._2, x._2)).sortBy(_._1)
          }
      val wB = ranged.sparkSession.sparkContext.broadcast(wanted)
      val found: Map[Long, Double] = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        val local = wB.value.getOrElse(pid, Nil)
        if (local.isEmpty) Iterator.empty
        else {
          val out = Seq.newBuilder[(Long, Double)]
          var i = 0L
          var j = 0
          while (it.hasNext && j < local.length) {
            val row = it.next()
            if (i == local(j)._1) { out += ((local(j)._2, row.getDouble(0))); j += 1 }
            i += 1
          }
          out.result().iterator
        }
      }.collect().toMap
      needs.map { case (_, h, i0, i1) =>
        val v0 = found(i0)
        if (i1 == i0) v0
        else {
          val v1 = found(i1)
          if (v0 == v1) v0 else (i1 - h) * v0 + (h - i0) * v1
        }
      }.toArray
    } finally { ranged.unpersist(false); () }
  }

  /** Equi-depth histogram (the form optimizer stats actually keep):
    * `buckets`-1 exact percentile boundaries via [[exactQuantiles]]
    * (distributed selection — see there for why not the built-in
    * `percentile` aggregate), then one comparison-assignment pass. The
    * boundaries enter the second pass as a LITERAL array, so the
    * assignment is a pure scan-side expression — no join, no second
    * shuffle beyond the 20-group aggregate. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, buckets: Int = 20,
                         parts: Int = 64): DataFrame = {
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val bnds = exactQuantiles(df, valueCol, ps, parts)
    val x = col(valueCol).cast("double")
    val bArr = array(bnds.map(lit(_)): _*)
    df.groupBy(size(filter(bArr, b => x > b)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        (floor(min(x) * 100 + 0.5) / 100.0).as("lo"),
        (floor(max(x) * 100 + 0.5) / 100.0).as("hi"))
  }

  /** Rank agreement between two integer scores as Goodman–Kruskal
    * GAMMA (Goodman & Kruskal '54) — the curation question "do two
    * scorers rank documents the same way?" (e.g. a cheap heuristic vs
    * a trained head: if they agree, the cheap one gates the firehose
    * and the expensive one audits). Gamma over Kendall's tau-b is a
    * DELIBERATE choice: tau-b needs a square root (never integer-exact
    * cross-engine), while gamma = (C − D) / (C + D) over concordant/
    * discordant pairs is exact ppm arithmetic — ties on either axis
    * simply don't vote, which is also the right read on coarsely
    * banded scores.
    *
    * Pair counting never touches pairs of ROWS: the joint (x, y)
    * histogram is built first (ONE map-side-combined rollup), and C/D
    * fold over histogram-CELL pairs via a strict-inequality theta join
    * — each unordered cell pair counted once (b.x > a.x), products
    * routed through decimal(38,0). The caller owns the alphabet bound
    * (quantize scores to a small grid — the q199 16-level device): the
    * theta join is quadratic in CELLS, which is the point — 16×16
    * cells is 65k cell pairs regardless of corpus size.
    *
    * Output: one row — n_docs, concordant, discordant, gamma_ppm
    * (sign-factored division: C − D can be negative and Spark `div`
    * truncates while DuckDB `//` floors; NULL when no untied pair
    * exists). */
  def rankAgreement(df: DataFrame, xCol: String = "x",
                    yCol: String = "y"): DataFrame = {
    // persist: the histogram feeds THREE consumers (both theta-join
    // sides and the total) — unpersisted, each would rescan the input
    // corpus (the bitextMargin advice-class defect); released via
    // materializeAndRelease below, so no CacheManager entry outlives
    // the call
    val h = df.groupBy(col(xCol).as("hx"), col(yCol).as("hy"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val a = h.select(col("hx").as("ax"), col("hy").as("ay"),
      col("n").as("an"))
    val b = h.select(col("hx").as("bx"), col("hy").as("by"),
      col("n").as("bn"))
    // bounded theta join: both sides are the alphabet-bounded histogram
    val prod = a.join(b,
      col("bx") > col("ax") && col("by") =!= col("ay"))
      .agg(
        coalesce(sum(when(col("by") > col("ay"),
          col("an").cast("decimal(38,0)") * col("bn"))), lit(0))
          .cast("long").as("concordant"),
        coalesce(sum(when(col("by") < col("ay"),
          col("an").cast("decimal(38,0)") * col("bn"))), lit(0))
          .cast("long").as("discordant"))
    val total = h.agg(coalesce(sum(col("n")), lit(0L)).as("n_docs"))
    val out = total.crossJoin(prod)
      .withColumn("gamma_ppm", expr(
        """case when concordant + discordant > 0 then
          |  (case when concordant < discordant then -1 else 1 end) *
          |  cast((1000000 * cast(abs(concordant - discordant)
          |      as decimal(38,0)))
          |    div (concordant + discordant) as bigint)
          |end""".stripMargin))
    Dedup.materializeAndRelease(out, h)
  }
}
