package graft

import org.apache.spark.sql.functions._
import graft.ops.{Parse, Enrich}

/** Reference-pinned scenario tests (FIXTURES.md §A): the smoke.sh seed rows
  * with the exact NULL-propagation and rounding rules of
  * reference pipeline/app.py:44-76, plus both CDC envelope shapes. */
class ParseEnrichSpec extends SparkTestBase {
  import spark.implicits._

  private val wrapped =
    """{"payload":{"after":{"id":1,"content_id":"c-1","user_id":"u-1","event_type":"play","event_ts":"2024-01-01 00:00:01","duration_ms":60000,"device":"web","raw_payload":"{}"},"op":"c"}}"""
  private val bare =
    """{"after":{"id":2,"content_id":"c-1","user_id":"u-2","event_type":"finish","event_ts":"2024-01-01 00:00:02","duration_ms":180000,"device":"ios","raw_payload":"{}"},"op":"c"}"""
  private val deleteTombstone = """{"after":null,"op":"d"}"""
  private val malformed = """{"after":{"id":"not-a-number","event_type":"play"}"""
  private val garbage = """not json at all"""

  test("cdcEvents parses wrapped AND bare envelopes; drops tombstones/garbage") {
    val df = Seq(wrapped, bare, deleteTombstone, malformed, garbage).toDF("json")
    val got = Parse.cdcEvents(df).orderBy("event_id")
    val rows = got.collect()
    assert(rows.length == 2, s"got ${rows.length} rows")
    assert(rows(0).getAs[Long]("event_id") == 1L)
    assert(rows(0).getAs[String]("device") == "web")
    assert(rows(1).getAs[Long]("event_id") == 2L)
    assert(rows(1).getAs[Int]("duration_ms") == 180000)
    assert(got.schema("event_ts").dataType.typeName == "timestamp")
  }

  test("cdcEvents: invalid numeric casts degrade to NULL (non-ANSI reference semantics)") {
    val j = """{"after":{"id":9,"content_id":"c","duration_ms":"oops","event_ts":"nope"},"op":"c"}"""
    val row = Parse.cdcEvents(Seq(j).toDF("json")).collect().head
    assert(row.getAs[Long]("event_id") == 9L)
    assert(row.isNullAt(row.fieldIndex("duration_ms")))
    assert(row.isNullAt(row.fieldIndex("event_ts")))
  }

  test("enrich reproduces the smoke.sh pinned outputs (60.0/0.03, 180.0/0.10)") {
    val facts = Seq(
      (1L, "0001", Some(60000)),
      (2L, "0001", Some(180000)),
      (3L, "0001", None),           // duration NULL -> both derived NULL
      (4L, "missing", Some(60000))  // unmatched dim -> left join, pct NULL
    ).toDF("event_id", "content_id", "duration_ms")
    val dim = Seq(("0001", "podcast", Some(1800)), ("0002", "video", None))
      .toDF("content_id", "content_type", "length_seconds")
    val got = Enrich.enrich(facts, dim).orderBy("event_id").collect()
    assert(got(0).getAs[Double]("engagement_seconds") == 60.0)
    assert(got(0).getAs[Double]("engagement_pct") == 0.03)
    assert(got(0).getAs[String]("content_type") == "podcast")
    assert(got(1).getAs[Double]("engagement_seconds") == 180.0)
    assert(got(1).getAs[Double]("engagement_pct") == 0.10)
    assert(got(2).isNullAt(got(2).fieldIndex("engagement_seconds")))
    assert(got(2).isNullAt(got(2).fieldIndex("engagement_pct")))
    assert(got(3).getAs[Double]("engagement_seconds") == 60.0)
    assert(got(3).isNullAt(got(3).fieldIndex("engagement_pct")), "no length_seconds => pct NULL")
    assert(got(3).isNullAt(got(3).fieldIndex("content_type")), "left join keeps unmatched fact")
  }

  test("enrich: length_seconds NULL => pct NULL but seconds kept") {
    val facts = Seq((1L, "0002", Some(90000))).toDF("event_id", "content_id", "duration_ms")
    val dim = Seq(("0002", "video", None: Option[Int])).toDF("content_id", "content_type", "length_seconds")
    val r = Enrich.enrich(facts, dim).collect().head
    assert(r.getAs[Double]("engagement_seconds") == 90.0)
    assert(r.isNullAt(r.fieldIndex("engagement_pct")))
  }

  test("enrich plan broadcasts the dimension (no shuffle of the fact side)") {
    val facts = Seq((1L, "a", Some(1))).toDF("event_id", "content_id", "duration_ms")
    val dim = Seq(("a", "t", Some(10))).toDF("content_id", "content_type", "length_seconds")
    val plan = Enrich.enrich(facts, dim).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("enrichLargeDim uses a shuffled hash join and produces identical results") {
    val facts = Seq((1L, "a", Some(60000)), (2L, "b", Some(5000)), (3L, "zz", None))
      .toDF("event_id", "content_id", "duration_ms")
    val dim = Seq(("a", "t", Some(1800)), ("b", "u", None))
      .toDF("content_id", "content_type", "length_seconds")
    val big = Enrich.enrichLargeDim(facts, dim)
    assert(big.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "hint must produce a shuffled hash join")
    val a = big.orderBy("event_id").collect().map(_.toSeq).toList
    val b = Enrich.enrich(facts, dim).orderBy("event_id").collect().map(_.toSeq).toList
    assert(a == b)
  }
}
