package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Quality
import graft.streaming.StreamReadability

/** Streaming readability gate: corpus == at-or-above-cut docs,
  * quarantine == below-cut plus unmeasurable (NULL-metric) docs with
  * their metric columns, stream == batch value-for-value, replay
  * idempotency, empty-batch no-op. */
class StreamReadabilitySpec extends SparkTestBase {
  import spark.implicits._

  private val wave1 = Seq(
    1L -> "the cat sat. it ran!",     // fre 119698: keeps
    2L -> "banana bandana",           // fre -48995: quarantine
    3L -> null.asInstanceOf[String])  // unmeasurable: quarantine
  private val wave2 = Seq(
    4L -> "km",                       // fre 205820: keeps
    5L -> "")                         // wordless: quarantine

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("stream == batch: split on the cut, metric columns ride along") {
    val root = Files.createTempDirectory("sread").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamReadability.start(input.toDF().toDF("doc_id", "text"),
      s"$root/c", s"$root/q", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val corpus = StreamReadability.corpus(spark, s"$root/c").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fre_milli")).toMap
    assert(corpus == Map(1L -> 119698L, 4L -> 205820L))

    val quar = StreamReadability.quarantine(spark, s"$root/q").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Long]("fre_milli"))).toMap
    assert(quar.keySet == Set(2L, 3L, 5L))
    assert(quar(2L) == Some(-48995L))
    assert(quar(3L).isEmpty && quar(5L).isEmpty,
      "unmeasurable docs quarantine with NULL metrics, never land")

    // stream verdicts == the batch scoring, value for value
    val batchKeep = Quality.readability(docs(wave1 ++ wave2))
      .where(col("fre_milli").isNotNull && col("fre_milli") >= 30000L)
      .select("doc_id").as[Long].collect().toSet
    assert(corpus.keySet == batchKeep)
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("sread_r").toString
    StreamReadability.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamReadability.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q")
    def state() = (
      StreamReadability.corpus(spark, s"$root/c").collect()
        .map(_.getAs[Long]("doc_id")).toSet,
      StreamReadability.quarantine(spark, s"$root/q").collect()
        .map(_.getAs[Long]("doc_id")).toSet)
    val before = state()
    StreamReadability.gateBatch(docs(wave2), 1L, s"$root/c", s"$root/q")
    assert(state() == before)
    assert(spark.read.parquet(s"$root/q").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("sread_e").toString
    StreamReadability.gateBatch(docs(wave1), 0L, s"$root/c", s"$root/q")
    StreamReadability.gateBatch(docs(wave1).where(col("doc_id") < 0), 1L,
      s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
