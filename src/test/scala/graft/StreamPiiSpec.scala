package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Curate
import graft.streaming.StreamPii

/** Streaming PII gate: corpus == redactPii(batch minus card-bearers),
  * quarantine == the Luhn-confirmed card docs with cards scrubbed,
  * replay idempotency, empty-batch no-op. */
class StreamPiiSpec extends SparkTestBase {
  import spark.implicits._

  private val wave1 = Seq(
    1L -> "mail me at a@b.com today",                       // email only -> corpus
    2L -> "pay with 4111 1111 1111 1111 please",            // valid card -> quarantine
    3L -> "ref 4111111111111112 is not a real card")        // invalid card -> corpus
  private val wave2 = Seq(
    4L -> "call 555-867-5309 and 4111-1111-1111-1111 twice 4111 1111 1111 1111", // 2 cards
    5L -> "plain text, no numbers")

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("stream == batch: card docs quarantined and scrubbed, rest redacted") {
    val root = Files.createTempDirectory("spii").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamPii.start(input.toDF().toDF("doc_id", "text"),
      s"$root/c", s"$root/q", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamPii.corpus(spark, s"$root/c").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(corpus.keySet == Set(1L, 3L, 5L))
    assert(corpus(1L) == "mail me at [EMAIL] today", "email scrub on the way in")
    assert(corpus(3L).contains("4111111111111112"),
      "a FAILED checksum is not card data — stays, no false quarantine")

    val quar = StreamPii.quarantine(spark, s"$root/q").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_valid_cards"),
          r.getAs[scala.collection.Seq[String]]("masked_cards").toSeq,
          r.getAs[String]("text")))).toMap
    assert(quar.keySet == Set(2L, 4L))
    assert(quar(2L)._1 == 1L)
    assert(quar(2L)._2 == Seq("************1111"))
    assert(quar(2L)._3 == "pay with [CARD] please",
      "quarantined text must not carry the raw number")
    assert(quar(4L)._1 == 2L, "both spaced and dashed forms counted")
    assert(!quar(4L)._3.contains("4111"), "every card run scrubbed")
    assert(quar(4L)._3.contains("[PHONE]") && !quar(4L)._3.contains("555-867"),
      "quarantine gets the email/phone scrub too — it must not be the " +
        "one long-lived table keeping unredacted pattern-PII")
  }

  test("batch equivalence: the gate is a pure function of the batch") {
    val root = Files.createTempDirectory("spii_b").toString
    StreamPii.gateBatch(docs(wave1 ++ wave2), 0L, s"$root/c", s"$root/q")
    val expectClean = Curate.redactPii(docs(Seq(
      1L -> "mail me at a@b.com today",
      3L -> "ref 4111111111111112 is not a real card",
      5L -> "plain text, no numbers"))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = StreamPii.corpus(spark, s"$root/c").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got == expectClean)
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("spii_r").toString
    StreamPii.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamPii.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q")
    def state() = (
      StreamPii.corpus(spark, s"$root/c").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      StreamPii.quarantine(spark, s"$root/q").collect()
        .map(_.getLong(0)).toSet)
    val before = state()
    StreamPii.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q") // replay
    assert(state() == before)
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("spii_e").toString
    StreamPii.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamPii.gateBatch(docs(wave1).where(col("doc_id") < 0), 1L,
      s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
