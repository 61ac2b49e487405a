package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.streaming.StreamIvfIngest

/** Streaming IVF ingest: search over the live index == search over the
  * same rows appended batch-side at the same compaction cadence, any
  * stream prefix searchable, replay leaves top-k unchanged, compaction
  * cadence bounds per-list file counts, empty-batch no-op. */
class StreamIvfIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def vrow(id: Long, scale: Float): (Long, Array[Float]) =
    id -> Array.tabulate(8) { j =>
      val h = (id * 8 + j) * 0x9E3779B97F4A7C15L
      (((h >>> 11).toDouble / (1L << 53).toDouble * 2 - 1) * scale).toFloat
    }

  private val base = (0L until 40L).map(vrow(_, 1.0f))

  private def vdf(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("stream ingest == batch append under the same compaction cadence; files bounded") {
    val root = Files.createTempDirectory("sivf").toString
    Similarity.buildIvfIndex(vdf(base), s"$root/stream", nlist = 4)
    Similarity.buildIvfIndex(vdf(base), s"$root/batch", nlist = 4)
    // probes: 2x of base 0..2 — source wins, then its streamed twin
    val probes = vdf((0L until 3L).map(i => (i + 2000L) -> vrow(i, 2.0f)._2))
    def results(path: String): Set[(Long, Long, Int)] =
      StreamIvfIngest.search(spark, path, probes, k = 2, nprobe = 2)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    def listFiles(path: String): Long =
      Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, path)}/lists"))
        .filter(p => p.toString.endsWith(".parquet")).count()
    // wave 4 plants exact twins of base 0..2 at id+1000
    val waves: Seq[Seq[(Long, Array[Float])]] =
      (0 until 3).map(w => ((100L + w * 10) until (110L + w * 10))
        .map(vrow(_, 1.0f))) :+ (0L until 3L).map(i =>
        (i + 1000L) -> vrow(i, 2.0f)._2)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamIvfIngest.start(
      input.toDF().toDF("vec_id", "embedding"), s"$root/stream",
      s"$root/ck", compactEvery = 2)
    val postCompactFiles = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        input.addData(w: _*); q.processAllAvailable()
        StreamIvfIngest.ingestBatch(vdf(w), s"$root/batch")
        if ((i + 1) % 2 == 0) {
          Similarity.compactIvfIndex(spark, s"$root/batch")
          postCompactFiles += listFiles(s"$root/stream")
        }
        assert(results(s"$root/stream") == results(s"$root/batch"),
          s"stream and batch diverged after wave $i")
      }
    } finally q.stop()
    assert(postCompactFiles.size == 2, s"expected 2 cycles: $postCompactFiles")
    // a compaction rewrite lands one file per non-empty list — nlist=4
    assert(postCompactFiles.forall(_ <= 4),
      s"post-compact list files must stay list-bounded: $postCompactFiles")
    // the planted twins rank right behind their sources on the live index
    val top = results(s"$root/stream").groupBy(_._1)
      .map { case (qid, rs) => qid -> rs.toList.sortBy(_._3).map(_._2) }
    assert(top == Map(2000L -> List(0L, 1000L), 2001L -> List(1L, 1001L),
      2002L -> List(2L, 1002L)), s"$top")
  }

  test("replayed ingest batch leaves top-k unchanged") {
    val root = Files.createTempDirectory("sivf2").toString
    Similarity.buildIvfIndex(vdf(base), s"$root/ix", nlist = 4)
    val solo = Seq(vrow(500L, 1.0f))
    StreamIvfIngest.ingestBatch(vdf(solo), s"$root/ix")
    StreamIvfIngest.ingestBatch(vdf(solo), s"$root/ix") // re-delivery
    val probe = vdf(Seq((2500L, vrow(500L, 2.0f)._2)))
    val top2 = StreamIvfIngest.search(spark, s"$root/ix", probe,
        k = 2, nprobe = 2)
      .select("nid", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(top2.length == 2 && top2(0)._1 == 500L && top2(1)._1 != 500L,
      s"duplicate row must not occupy two ranks: ${top2.mkString(",")}")
  }

  test("empty batch is a no-op") {
    val root = Files.createTempDirectory("sivf3").toString
    Similarity.buildIvfIndex(vdf(base), s"$root/ix", nlist = 4)
    val before = Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, s"$root/ix")}/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    StreamIvfIngest.ingestBatch(vdf(base).where(lit(false)), s"$root/ix")
    val after = Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, s"$root/ix")}/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(after == before, "empty batch must not touch the index")
  }
}
