package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension join + derived-column enrichment (reference
  * pipeline/app.py:60-76: per-batch dim read, broadcast LEFT join on
  * content_id, then `engagement_seconds` / `engagement_pct`).
  *
  * NULL rules are load-bearing (README.md:91-92):
  *   - duration_ms NULL  => engagement_seconds NULL and engagement_pct NULL
  *   - length_seconds NULL => engagement_pct NULL only
  *   - unmatched content_id => LEFT join keeps the row, dim columns NULL
  * `engagement_pct` is a *ratio*, not ×100, rounded HALF_UP to 2 places
  * (app.py:74-76 — the name lies; we follow the code). Rounding uses
  * Relational.round2 (HALF_UP on the binary double) rather than Spark's
  * `round`, which rounds the shortest decimal repr and disagrees with
  * every other engine on values like 0.175.
  *
  * Scale note: the dimension is broadcast explicitly — at 100 TB the fact
  * stream shuffles for nothing if this were a sort-merge join; the dim
  * (content catalog) is always the small side. If the dim ever outgrew the
  * broadcast threshold the right move is a shuffled hash join on
  * content_id, not sort-merge, since facts dwarf dims.
  */
object Enrich {

  /** facts must have (content_id, duration_ms); dim must have
    * (content_id, content_type, length_seconds). Extra columns pass through.
    */
  def enrich(facts: DataFrame, dim: DataFrame): DataFrame =
    derive(facts.join(broadcast(dim), Seq("content_id"), "left"))

  /** Same enrichment for a dimension too large to broadcast: shuffled
    * HASH join (hint), not sort-merge — facts dwarf dims, so paying a
    * full sort of the fact side to avoid building a hash table of the dim
    * partition is the wrong trade. Same NULL semantics as `enrich`. */
  def enrichLargeDim(facts: DataFrame, dim: DataFrame): DataFrame =
    derive(facts.join(dim.hint("shuffle_hash"), Seq("content_id"), "left"))

  private def derive(joined: DataFrame): DataFrame =
    joined
      .withColumn("engagement_seconds",
        when(col("duration_ms").isNull, lit(null))
          .otherwise((col("duration_ms") / 1000.0).cast("double")))
      .withColumn("engagement_pct",
        when(col("length_seconds").isNull || col("duration_ms").isNull, lit(null))
          .otherwise(Relational.round2((col("duration_ms") / 1000.0) / col("length_seconds"))))
}
