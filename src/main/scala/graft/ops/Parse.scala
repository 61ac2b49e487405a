package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC envelope parsing — the reference's stream projection re-expressed
  * declaratively (reference pipeline/app.py:44-53: seven `get_json_object`
  * calls + casts + `event_id IS NOT NULL`).
  *
  * Differences from the reference, by design (SURVEY.md §1.2):
  *   - Dual-shape envelope: with Debezium JSON converters and
  *     `schemas.enable=false` the value is the *bare* envelope
  *     `{"before":…,"after":…,"op":…}`; with schemas enabled it is wrapped
  *     under `$.payload`. The reference only reads `$.payload.after.*`
  *     (app.py:46-52) which silently drops bare envelopes; we accept both
  *     via a single `from_json` over a superset schema + `coalesce`.
  *   - `from_json` with a declared StructType instead of repeated
  *     `get_json_object`: one parse per row, columnar-prunable, stays inside
  *     whole-stage codegen.
  *   - `raw` (the whole after-image JSON) is carried through as a string
  *     column — the faithful superset of the reference's dropped
  *     `raw_payload` (app.py never extracts it, README claims it does).
  */
object Parse {

  /** Debezium after-image for engagement_events (sql/00_init_schema.sql:9-18).
    * Everything is parsed as string first; typed casts happen after the
    * wrapped/bare coalesce so malformed values degrade to NULL exactly like
    * the reference's non-ANSI casts.
    */
  val afterSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("content_id", StringType),
    StructField("user_id", StringType),
    StructField("event_type", StringType),
    StructField("event_ts", StringType),
    StructField("duration_ms", StringType),
    StructField("device", StringType),
    StructField("raw_payload", StringType)
  ))

  /** Superset envelope: matches both `{"payload":{"after":…,"op":…}}` and
    * bare `{"after":…,"op":…}` in one parse (absent fields become NULL).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("after", afterSchema),
      StructField("op", StringType)
    ))),
    StructField("after", afterSchema),
    StructField("op", StringType)
  ))

  /** Parse a DataFrame with a JSON string column into typed engagement
    * events. Mirrors app.py:44-53: binary→string cast is the caller's
    * concern (Kafka `value` → `cast("string")`); here we parse, coalesce
    * the two envelope shapes, cast, and filter `event_id IS NOT NULL`.
    *
    * The parse sits behind a Generate node (`inline(array(from_json(…)))`)
    * on purpose: CollapseProject inlines plain projection aliases into
    * every downstream reference, which duplicated the `from_json` once per
    * extracted field (5+ full JSON parses per row — measured 2x-13x slower
    * end-to-end). A Generate is a collapse barrier, so the envelope is
    * parsed exactly once per row and the per-field work downstream is
    * attribute access on the parsed struct. A malformed row parses to a
    * NULL struct => all-NULL fields => dropped by the event_id filter,
    * exactly like the reference's non-ANSI casts.
    */
  def cdcEvents(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    val env = raw.select(inline(array(from_json(col(jsonCol), envelopeSchema))))
    val a = coalesce(col("payload.after"), col("after"))
    env.select(
        a.getField("id").cast(LongType).as("event_id"),
        a.getField("content_id").cast(StringType).as("content_id"),
        a.getField("user_id").cast(StringType).as("user_id"),
        a.getField("event_type").as("event_type"),
        to_timestamp(a.getField("event_ts")).as("event_ts"),
        a.getField("duration_ms").cast(IntegerType).as("duration_ms"),
        a.getField("device").as("device"),
        a.getField("raw_payload").as("raw")
      )
      .where(col("event_id").isNotNull)
  }

  /** Wrap a bare after-image JSON column into a Debezium-shaped envelope
    * string — used to exercise the CDC parser against testdata `events.props`
    * (which is a plain JSON object, not an envelope). Even ids get the
    * wrapped shape, odd ids the bare shape, so both parse paths are hot.
    */
  def asEnvelope(afterJson: Column, id: Column): Column =
    when(id % 2 === 0,
      concat(lit("""{"payload":{"after":"""), afterJson, lit(""","op":"c"}}""")))
    .otherwise(
      concat(lit("""{"after":"""), afterJson, lit(""","op":"c"}""")))
}
