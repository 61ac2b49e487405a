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
}
