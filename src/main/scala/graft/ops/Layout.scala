package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Data layout for multi-dimensional scan pruning: Z-ORDER clustering.
  *
  * A table sorted by one key prunes row groups only for filters on that
  * key; a table range-partitioned AND sorted by the Morton z-value of two
  * keys keeps parquet min/max statistics tight on BOTH — filters on either
  * dimension (or both) skip most row groups. This is what Delta/Iceberg
  * `OPTIMIZE ZORDER BY` does; here it is a plain repartitionByRange +
  * sortWithinPartitions over the codegen'd `graft.expr.ZValue`, writable
  * to vanilla parquet.
  *
  * Keys must be non-negative and fit in 32 bits (true for dictionary-coded
  * surrogate keys; hash wider/negative domains into 32 bits first — the
  * clustering only needs order preservation within each dimension's common
  * range, not exact values).
  */
object Layout {

  def zValue(a: Column, b: Column): Column = Exprs.zValue(a, b)

  /** Cluster `df` for 2-D pruning on (dimA, dimB). `numFiles` bounds the
    * output file count (range partitioner => near-equal file sizes). */
  def zorder(df: DataFrame, dimA: String, dimB: String, numFiles: Int = 16): DataFrame = {
    val z = zValue(col(dimA), col(dimB))
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Fraction of `blockRows`-row blocks a range filter on one column would
    * touch under the CURRENT row order — a direct, engine-independent
    * measure of min/max skipping effectiveness (1.0 = no pruning). Used by
    * tests and layout tuning; runs one pass per probed column. */
  def blockTouchFraction(df: DataFrame, column: String, lo: Long, hi: Long,
                         blockRows: Int = 4096): Double = {
    val blocks = df
      .select(col(column).cast("long").as("v"))
      .withColumn("p", spark_partition_id())
      .rdd.mapPartitions { it =>
        it.grouped(blockRows).map { g =>
          val vs = g.map(_.getLong(0))
          (vs.min, vs.max)
        }
      }.collect()
    if (blocks.isEmpty) 0.0
    else blocks.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / blocks.length
  }
}
