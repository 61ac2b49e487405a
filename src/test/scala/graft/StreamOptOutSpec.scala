package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Web
import graft.streaming.StreamOptOut

/** Streaming opt-out gate: corpus == ungoverned docs, dropped store ==
  * governed docs with longest-match attribution, registry loaded once,
  * stream == batch, replay idempotency, empty-batch no-op, lifetime
  * audit with zero-hit entries. */
class StreamOptOutSpec extends SparkTestBase {
  import spark.implicits._

  private val wave1 = Seq(
    1L -> "http://a.b.example.com/x",    // suffix hit -> dropped
    2L -> "http://kept.org/y",           // kept
    3L -> "https://sub.example.com/z")   // longest match sub.example.com
  private val wave2 = Seq(
    4L -> "http://example.com:8080/w",   // port never governs -> dropped
    5L -> "http://localhost/v")          // single label -> kept

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "url")

  private def writeRegistry(dir: String): Unit =
    Seq("example.com", "sub.example.com", "never.net").toDF("domain")
      .write.mode("overwrite").parquet(dir)

  test("stream == batch: governed docs dropped with attribution, rest kept") {
    val root = Files.createTempDirectory("soo").toString
    writeRegistry(s"$root/reg")
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamOptOut.start(input.toDF().toDF("doc_id", "url"),
      s"$root/reg", s"$root/c", s"$root/d", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamOptOut.corpus(spark, s"$root/c").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(corpus == Set(2L, 5L))
    val dropped = StreamOptOut.dropped(spark, s"$root/d").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("optout_domain")).toMap
    assert(dropped == Map(1L -> "example.com", 3L -> "sub.example.com",
      4L -> "example.com"))
    // stream verdict == the batch op, value for value
    val reg = Seq("example.com", "sub.example.com", "never.net").toDF("domain")
    val batch = Web.domainOptOut(docs(wave1 ++ wave2), reg).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(batch == (corpus.map(_ -> None).toMap ++
      dropped.view.mapValues(Option(_)).toMap))
    // lifetime audit: longest-match attribution + the zero-hit entry
    val audit = StreamOptOut.audit(spark, s"$root/d", s"$root/reg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit == Map("example.com" -> 2L, "sub.example.com" -> 1L,
      "never.net" -> 0L))
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("soo_r").toString
    writeRegistry(s"$root/reg")
    val reg = spark.read.parquet(s"$root/reg")
    StreamOptOut.gateBatchWith(docs(wave1), 0L, reg, s"$root/c", s"$root/d")
    StreamOptOut.gateBatchWith(docs(wave2), 1L, reg, s"$root/c", s"$root/d")
    def state() = (
      StreamOptOut.corpus(spark, s"$root/c").collect()
        .map(_.getAs[Long]("doc_id")).toSet,
      StreamOptOut.dropped(spark, s"$root/d").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("optout_domain"))).toSet)
    val before = state()
    StreamOptOut.gateBatchWith(docs(wave2), 1L, reg, s"$root/c", s"$root/d")
    assert(state() == before)
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("soo_e").toString
    writeRegistry(s"$root/reg")
    val reg = spark.read.parquet(s"$root/reg")
    StreamOptOut.gateBatchWith(docs(wave1), 0L, reg, s"$root/c", s"$root/d")
    StreamOptOut.gateBatchWith(docs(wave1).where(col("doc_id") < 0), 1L, reg,
      s"$root/c", s"$root/d")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
