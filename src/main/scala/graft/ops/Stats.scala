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
}
