package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured processing via Spark 4's VariantType — the shredded
  * binary JSON encoding built for exactly the problem the reference's
  * `raw_payload` JSONB column poses at scale: schema-on-read fields that a
  * string-JSON column would re-parse on every access. `parse_json` decodes
  * the text ONCE into the variant binary form; each `variant_get` is then
  * a cheap typed path lookup, and (on parquet writers that support it) the
  * shredded layout lets the scan prune to the accessed paths the way a
  * struct column would.
  *
  * This is the idiomatic Spark 4 upgrade over the reference's
  * get_json_object calls (pipeline/app.py:45-52) and over our own
  * from_json envelope path (ops/Parse.scala) — kept separate because
  * from_json with a declared schema is still the right call when the
  * schema IS known; variant wins when it isn't.
  */
object Variants {

  /** Typed extraction + aggregation over the events `props` JSON —
    * parse_json once, variant_get per field, then a plain aggregate. */
  def propsSummary(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
}
