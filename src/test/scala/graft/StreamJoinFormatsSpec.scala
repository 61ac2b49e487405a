package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Relational
import graft.sources.FileFormats
import graft.streaming.StreamJoin

class StreamJoinFormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream attribution join: in-window clicks attach, out-of-window don't") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]   // (event_id, ts, user_id)
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoin.attributeClicks(
      imps.toDF().toDF("event_id", "ts", "user_id"),
      clicks.toDF().toDF("event_id", "ts", "user_id"),
      windowMinutes = 10)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attrib").start()
    try {
      imps.addData((100L, ts("2024-01-01 10:00:00"), 1L),
                   (101L, ts("2024-01-01 10:00:00"), 2L))
      clicks.addData(
        (200L, ts("2024-01-01 10:05:00"), 1L),  // in window -> attributed
        (201L, ts("2024-01-01 10:20:00"), 2L),  // 20m later -> NOT attributed
        (202L, ts("2024-01-01 10:01:00"), 3L))  // no impression -> dropped (inner)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib")
      .select("user_id", "click_id", "impression_id", "lag_s")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(rows == List((1L, 200L, 100L, 300.0)), s"got $rows")
  }

  test("csv and json-lines readers: schema-first round trip, malformed rows -> nulls") {
    val tmp = Files.createTempDirectory("graft-ff").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/data.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\nnot_a_number,gamma,oops\n")
    val csv = FileFormats.readCsv(spark, s"$tmp/data.csv", schema).orderBy("name").collect()
    assert(csv.length == 3)
    assert(csv(0).getAs[Long]("id") == 1L && csv(0).getAs[Double]("score") == 1.5)
    assert(csv(2).isNullAt(0), "malformed id must degrade to null, not kill the job")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/data.jsonl"),
      """{"id":1,"name":"alpha","score":1.5}""" + "\n" +
      """{"id":2,"name":"beta"}""" + "\n" +
      """garbage line""" + "\n")
    val json = FileFormats.readJsonLines(spark, s"$tmp/data.jsonl", schema)
    assert(json.where(col("id").isNotNull).count() == 2)
    assert(json.where(col("id") === 2).collect().head.isNullAt(2), "absent field -> null")
  }

  test("orc round trip: schema and values preserved, pruning pushdown works") {
    val tmp = Files.createTempDirectory("graft-orc").toString
    val df = (1L to 100L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "score")
    FileFormats.writeOrc(df, s"$tmp/t.orc")
    val back = FileFormats.readOrc(spark, s"$tmp/t.orc")
    assert(back.schema.map(_.name) == Seq("id", "name", "score"))
    assert(back.count() == 100)
    assert(back.where(col("id") === 42).select("score").as[Double].head() == 63.0)
    // predicate reaches the ORC scan (PushedFilters in the plan text)
    val plan = back.where(col("id") > 90).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90"), plan)
  }

  test("approx_count_distinct within 3*rsd of exact on real data") {
    val li = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val approx = Relational.approxDistinctCounts(li, rsd = 0.01).collect().head
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("p"),
      countDistinct(col("l_suppkey")).as("s")).collect().head
    def relErr(a: Long, e: Long) = math.abs(a - e).toDouble / e
    assert(relErr(approx.getAs[Long]("n_parts"), exact.getAs[Long]("p")) <= 0.03,
      s"parts: approx=${approx.getAs[Long]("n_parts")} exact=${exact.getAs[Long]("p")}")
    assert(relErr(approx.getAs[Long]("n_supps"), exact.getAs[Long]("s")) <= 0.03)
  }
}
