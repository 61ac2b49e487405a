package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Quality
import graft.streaming.StreamLicense

/** Streaming license gate: corpus == the permissive docs, quarantine ==
  * copyleft/other-spdx/unlicensed WITH census columns, stream == batch
  * value-for-value, replay idempotency, empty-batch no-op. */
class StreamLicenseSpec extends SparkTestBase {
  import spark.implicits._

  private val wave1 = Seq(
    1L -> "SPDX-License-Identifier: MIT\nhello world",        // permissive
    2L -> "SPDX-License-Identifier: GPL-3.0-only\ncode",      // copyleft
    3L -> "released under the Apache License, Version 2.0",   // permissive prose
    4L -> "no license at all here")                           // none
  private val wave2 = Seq(
    5L -> "under the GNU General Public License; MIT License text follows", // copyleft > permissive
    6L -> "SPDX-License-Identifier: WTFPL\nanything goes")    // other-spdx

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("stream == batch: split by verdict, census columns ride along") {
    val root = Files.createTempDirectory("slic").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamLicense.start(input.toDF().toDF("doc_id", "text"),
      s"$root/c", s"$root/q", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamLicense.corpus(spark, s"$root/c").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("license_class")).toMap
    assert(corpus.keySet == Set(1L, 3L), "only permissive docs land")
    assert(corpus.values.forall(_ == "permissive"))

    val quar = StreamLicense.quarantine(spark, s"$root/q").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("license_class"), r.getAs[String]("spdx_id")))).toMap
    assert(quar.keySet == Set(2L, 4L, 5L, 6L))
    assert(quar(2L) == (("copyleft", "GPL-3.0-only")))
    assert(quar(4L) == (("none", null)), "unlicensed is quarantined too")
    assert(quar(5L)._1 == "copyleft",
      "copyleft prose outranks permissive prose (the q213 precedence)")
    assert(quar(6L) == (("other-spdx", "WTFPL")),
      "an unrecognized SPDX id takes the conservative side")
    // stream result == the batch census, value for value
    val batchCensus = Quality.licenseCensus(docs(wave1 ++ wave2)).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert((corpus ++ quar.view.mapValues(_._1).toMap) == batchCensus)
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("slic_r").toString
    StreamLicense.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamLicense.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q")
    def state() = (
      StreamLicense.corpus(spark, s"$root/c").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet,
      StreamLicense.quarantine(spark, s"$root/q").collect()
        .map(_.getAs[Long]("doc_id")).toSet)
    val before = state()
    StreamLicense.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q") // replay
    assert(state() == before)
    assert(spark.read.parquet(s"$root/q").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("slic_e").toString
    StreamLicense.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamLicense.gateBatch(docs(wave1).where(col("doc_id") < 0), 1L,
      s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
