package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.streaming.StreamContam

/** Streaming semantic-contamination gate: stream == batch
  * value-for-value against a direct semanticContamination split,
  * replay idempotency, empty-batch no-op. */
class StreamContamSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  // bench: probe 100 along e1, probe 101 along e3
  private val bench = Seq(
    (100L, Array(1f, 0f, 0f, 0f)),
    (101L, Array(0f, 0f, 1f, 0f)))
  private val wave1 = Seq(
    (1L, Array(2f, 0f, 0f, 0f)),   // hit by 100 (cos 1)
    (2L, Array(0f, 1f, 0f, 0f)),   // clean
    (3L, Array(1f, 1f, 0f, 0f)))   // cos .707 with 100: below 0.8
  private val wave2 = Seq(
    (4L, Array(0f, 0f, 5f, 0f)),   // hit by 101
    (5L, Array(1f, 0f, 1f, 0f)))   // .707 with both: clean at 0.8

  test("stream == batch: quarantine matches the direct drop list, corpus is the complement") {
    val root = Files.createTempDirectory("scontam").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val q = StreamContam.start(stream, vecs(bench), s"$root/c",
      s"$root/q", s"$root/ck", minCos = 0.8)
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val direct = Similarity.semanticContamination(
      vecs(wave1 ++ wave2), vecs(bench), minCos = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val gotQuar = StreamContam.quarantine(spark, s"$root/q").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gotQuar == direct, "quarantine must equal the batch drop list")
    assert(gotQuar.keySet == Set(1L, 4L))
    assert(gotQuar(1L) == ((1L, 1.0)))
    val gotCorpus = StreamContam.corpus(spark, s"$root/c").collect()
      .map(_.getLong(0)).toSet
    assert(gotCorpus == Set(2L, 3L, 5L),
      "every vector lands on exactly one side")
  }

  test("replayed batch rewrites identical partitions; empty batch is a no-op") {
    val root = Files.createTempDirectory("scontam_r").toString
    val benchDf = vecs(bench)
    StreamContam.gateBatch(vecs(wave1), 0L, benchDf, s"$root/c", s"$root/q",
      minCos = 0.8)
    StreamContam.gateBatch(vecs(wave2), 1L, benchDf, s"$root/c", s"$root/q",
      minCos = 0.8)
    def state() = (
      StreamContam.corpus(spark, s"$root/c").collect()
        .map(_.getLong(0)).toSet,
      StreamContam.quarantine(spark, s"$root/q").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    val before = state()
    StreamContam.gateBatch(vecs(wave2), 1L, benchDf, s"$root/c", s"$root/q",
      minCos = 0.8) // replay
    assert(state() == before)
    assert(spark.read.parquet(s"$root/q").select("_batch")
      .distinct().count() == 2)
    StreamContam.gateBatch(vecs(Seq.empty), 2L, benchDf, s"$root/c",
      s"$root/q", minCos = 0.8) // empty: must not write a _batch=2
    assert(state() == before)
    assert(spark.read.parquet(s"$root/c").select("_batch")
      .distinct().count() == 2)
  }
}
