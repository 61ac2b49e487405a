package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Pipeline
import graft.streaming.StreamGovernance

/** Streaming governance sweep: corpus == keep verdicts, quarantine ==
  * reason-coded rejects carrying every gate's evidence, stream == batch
  * value-for-value, replay idempotency, empty-batch no-op. */
class StreamGovernanceSpec extends SparkTestBase {
  import spark.implicits._

  private val readable = "the cat sat here. it ran off! we saw it go."
  private val wave1 = Seq(
    (1L, "http://banned.example.com/a", readable),              // opted_out
    (2L, "http://ok.example.com/b",
      s"SPDX-License-Identifier: GPL-3.0-only $readable"),      // license
    (3L, "http://ok.example.com/c", readable))                  // keep
  private val wave2 = Seq(
    (4L, "http://ok.example.com/d", s"mail u4@example.com $readable"), // pii
    (5L, "http://ok.example.com/e", "banana bandana banana"))   // unreadable

  private def docs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "url", "text")

  private def writeRegistry(dir: String): Unit =
    Seq("banned.example.com").toDF("domain")
      .write.mode("overwrite").parquet(dir)

  test("stream == batch: verdicts split, evidence columns ride along") {
    val root = Files.createTempDirectory("sgov").toString
    writeRegistry(s"$root/reg")
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamGovernance.start(
      input.toDF().toDF("doc_id", "url", "text"),
      s"$root/reg", s"$root/c", s"$root/q", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamGovernance.corpus(spark, s"$root/c").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(corpus == Set(3L), "only keep verdicts land")

    val quar = StreamGovernance.quarantine(spark, s"$root/q").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(quar == Map(1L -> "opted_out", 2L -> "license",
      4L -> "pii", 5L -> "unreadable"))

    // stream verdicts == the batch sweep, value for value
    val reg = spark.read.parquet(s"$root/reg")
    val batch = Pipeline.governanceSweep(docs(wave1 ++ wave2), reg)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert((corpus.map(_ -> "keep").toMap ++ quar) == batch)
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("sgov_r").toString
    writeRegistry(s"$root/reg")
    val reg = spark.read.parquet(s"$root/reg").select(col("domain"))
    StreamGovernance.gateBatchWith(docs(wave1), 0L, reg, s"$root/c", s"$root/q")
    StreamGovernance.gateBatchWith(docs(wave2), 1L, reg, s"$root/c", s"$root/q")
    def state() = (
      StreamGovernance.corpus(spark, s"$root/c").collect()
        .map(_.getAs[Long]("doc_id")).toSet,
      StreamGovernance.quarantine(spark, s"$root/q").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"))).toSet)
    val before = state()
    StreamGovernance.gateBatchWith(docs(wave2), 1L, reg, s"$root/c", s"$root/q")
    assert(state() == before)
    assert(spark.read.parquet(s"$root/q").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("sgov_e").toString
    writeRegistry(s"$root/reg")
    val reg = spark.read.parquet(s"$root/reg").select(col("domain"))
    StreamGovernance.gateBatchWith(docs(wave1), 0L, reg, s"$root/c", s"$root/q")
    StreamGovernance.gateBatchWith(docs(wave1).where(col("doc_id") < 0), 1L,
      reg, s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
