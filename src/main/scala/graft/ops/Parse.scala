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
    */
  def cdcEvents(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    val env = raw.withColumn("_env", from_json(col(jsonCol), envelopeSchema))
    def f(field: String): Column =
      coalesce(col(s"_env.payload.after.$field"), col(s"_env.after.$field"))
    env.select(
        f("id").cast(LongType).as("event_id"),
        f("content_id").cast(StringType).as("content_id"),
        f("user_id").cast(StringType).as("user_id"),
        f("event_type").as("event_type"),
        to_timestamp(f("event_ts")).as("event_ts"),
        f("duration_ms").cast(IntegerType).as("duration_ms"),
        f("device").as("device"),
        f("raw_payload").as("raw")
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
