package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC materialization: collapse a change stream into the current table
  * image. The reference only ever *forwards* inserts (its Debezium feed is
  * insert-only in practice — SURVEY.md §2.1 S3); a real deployment of the
  * same topology also receives updates and deletes, and the consumer that
  * maintains a queryable copy of the source table needs exactly this
  * operator (the batch analog of what Debezium+JDBC-sink engines call
  * "upsert mode").
  *
  * Semantics: keep, per key, only the row with the highest version; drop
  * the key entirely if that terminal row is a delete. Redelivered
  * (duplicate) change rows collapse for free — they tie on version and
  * row_number keeps one.
  *
  * Scale: one shuffle, keyed on the entity key — the minimum any
  * per-key-latest computation needs. The window does a per-key sort of
  * *versions per key* (bounded by churn, not table size); no global sort.
  * At 100 TB this runs per partition-pruned time slice (compact the last
  * day's changes into the image), which is how the big lakehouse MERGE
  * implementations schedule it too.
  */
object Cdc {

  /** Terminal row per key — INCLUDING deletes (tombstones). The stored
    * form for incremental image maintenance (streaming/CdcImage): a
    * partition whose last change is a delete still yields a row, so
    * partition-limited rewrites (dynamic overwrite) always rewrite every
    * touched partition. Readers filter tombstones; compaction drops them. */
  def latestVersions(changes: DataFrame, keyCols: Seq[String],
                     versionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    changes
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Latest image per key from a change set.
    * @param versionCols highest wins; supply a tie-breaker (e.g. the
    *                    monotonically increasing change id) as a trailing
    *                    column if versions can collide. */
  def latestImage(changes: DataFrame, keyCols: Seq[String],
                  versionCols: Seq[String], opCol: String = "op",
                  deleteOp: String = "d"): DataFrame =
    latestVersions(changes, keyCols, versionCols)
      .where(col(opCol) =!= deleteOp)

  /** Type-2 slowly-changing dimension from the same change log: every
    * non-delete change becomes a VERSION row valid from its own sequence
    * number until the key's next change (any op, deletes close the last
    * version); `valid_to` NULL + `is_current` mark the open version. This
    * is the history table a warehouse keeps NEXT to [[latestImage]]'s
    * current view — "what did this dimension row look like when the fact
    * happened" joins against [valid_from, valid_to).
    *
    * Scale shape is identical to latestImage: ONE shuffle keyed on the
    * entity key, and the window sorts versions-per-key (bounded by churn,
    * never table size). The validity interval is over the supplied total
    * order (version/sequence column), so the output is engine-exact —
    * no timestamps are compared, only the caller's ordering column.
    * @param seqCol  a per-key total order (CDC sequence / LSN / change id;
    *                ties would make history ambiguous, so supply a
    *                tie-broken column). */
  def scd2(changes: DataFrame, keyCols: Seq[String], seqCol: String,
           opCol: String = "op", deleteOp: String = "d"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .where(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** As-of lookup against an [[scd2]] history: for each probe row, the
    * dimension version valid at the probe's sequence point — "what did
    * this row look like when the fact happened", the query the history
    * table exists to serve. Equi-join on the entity key (the validity
    * range lands as a post-join filter, so this stays a hash/sort-merge
    * join — never a nested loop); each probe matches at most one version
    * because [[scd2]] intervals partition the sequence axis per key.
    * @param probeSeqCol probe-side column holding the as-of sequence;
    *                    must not collide with history column names. */
  def asOfLookup(history: DataFrame, probes: DataFrame, keyCols: Seq[String],
                 probeSeqCol: String): DataFrame =
    probes.join(history, keyCols)
      .where(col(probeSeqCol) >= col("valid_from") &&
        (col("valid_to").isNull || col(probeSeqCol) < col("valid_to")))

  /** Incremental [[scd2]] maintenance: fold a NEW slice of the change log
    * into an existing history table without rebuilding it — the daily
    * merge a warehouse actually runs (rebuilding history from the full
    * log is a 100 TB scan; the increment touches only the new changes
    * plus the open versions of the keys they mention).
    *
    * Contract: every new change's sequence exceeds everything already in
    * `history` for its key (CDC logs are ordered — the same assumption
    * the streaming image maintenance makes). Under it the result is
    * EXACTLY `scd2(full log)` — q101 gates that equivalence against
    * q95's oracle.
    *
    * Shape: the per-key first-new-sequence frame (one row per TOUCHED
    * key, broadcastable) left-joins the history to close open versions;
    * new versions chain among themselves via the same window as the
    * batch form, over the new slice only. At scale the history side
    * additionally prunes to `is_current` partitions/files — closed
    * versions are immutable and never rewritten. */
  def scd2Merge(history: DataFrame, changes: DataFrame, keyCols: Seq[String],
                seqCol: String, opCol: String = "op",
                deleteOp: String = "d"): DataFrame = {
    val firstNew = changes.groupBy(keyCols.map(col): _*)
      .agg(min(col(seqCol)).as("_first_new"))
    val closed = history
      .join(broadcast(firstNew), keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current") && col("_first_new").isNotNull, col("_first_new"))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("is_current") && col("_first_new").isNull)
      .drop("_first_new")
    closed.unionByName(scd2(changes, keyCols, seqCol, opCol, deleteOp))
  }
}
