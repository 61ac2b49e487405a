package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key (skew) mitigation for shuffles AQE cannot fix on its own.
  *
  * Where each tool applies at 100 TB:
  *   - AQE skew-join splitting (on in graft.Conf) fixes skewed SORT-MERGE
  *     joins by splitting oversized partitions — but only when the other
  *     side can be replicated per split, and never for aggregations.
  *   - `broadcast()` removes the shuffle entirely — only for small dims.
  *   - SALTING (here) is the remaining case: a shuffle join/agg where one
  *     side has pathological keys (the null key, a bot user, an empty
  *     document) and the other side is too big to broadcast.
  *
  * Salted join: the fact side gets a deterministic salt in [0, buckets)
  * derived from non-key columns; the dim side is replicated `buckets`
  * times; the join key becomes (key, salt) so one hot key spreads over
  * `buckets` reducers. Replication cost: |dim| * buckets rows — chosen,
  * bounded, and local (the explode is map-side), versus one reducer
  * receiving the whole hot key's fact rows.
  *
  * Salted aggregation: two-phase — partial agg on (key, salt), final agg
  * on key. For algebraic aggregates Spark's hash-agg already does map-side
  * partial combine, which usually suffices; the two-phase form matters for
  * size-based skew in `collect_list`-like or distinct aggregations where
  * one key's state would blow a single reducer.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from arbitrary discriminator
    * columns (e.g. a row id) — reproducible, no rand(), survives retries
    * (a rand() salt breaks task-retry determinism and with it
    * effectively-once sinks). */
  def salt(buckets: Int, discriminators: Column*): Column =
    pmod(xxhash64(discriminators: _*), lit(buckets.toLong)).cast("int")

  /** Equi-join `facts` (skewed) with `dim` (not broadcastable) on `key`,
    * spreading each key over `buckets` reducers. Inner/left semantics of
    * the underlying join preserved. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16, joinType: String = "inner",
                 discriminator: Option[Column] = None): DataFrame = {
    // default discriminator = hash of the whole fact row: content-derived,
    // so identical across task retries and repartitioning (rand() or
    // monotonically_increasing_id would not be)
    val disc = discriminator.getOrElse(struct(facts.columns.map(col): _*))
    val fs = facts.withColumn("_salt", salt(buckets, disc))
    val ds = dim.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    fs.join(ds, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase count per key: partial on (key, salt), final on key. */
  def saltedCount(df: DataFrame, key: String, buckets: Int = 16,
                  discriminator: Option[Column] = None): DataFrame = {
    val disc = discriminator.getOrElse(struct(df.columns.map(col): _*))
    df.withColumn("_salt", salt(buckets, disc))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))
  }
}
