package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Dedup}
import graft.streaming.StreamVideoDedup

/** Streaming perceptual video dedup: in-batch and cross-batch temporal
  * twins dropped, single-stream == batch videoSurvivors, replay
  * idempotent, non-video assets pass through with no index rows.
  */
class StreamVideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(seed: Long, shift: Int = 0): Array[Byte] =
    Codecs.encodePpm(18, 12, (x, y) => (
      ((x * 7 + y * 13 + seed) % 201 + shift).toInt,
      ((x * 3 + y * 11 + 2 * seed) % 201 + shift).toInt,
      ((x * 5 + y * 17 + 3 * seed) % 201 + shift).toInt))

  /** A video of the given frame seeds; shift makes a brightness twin
    * whose per-frame dHashes (hence shingles) are identical. */
  private def vid(shift: Int, seeds: Long*): Array[Byte] =
    Codecs.encodeVideo(seeds.map(s => frame(s, shift)))

  test("streaming filter == batch videoSurvivors; cross-batch trim twin dropped") {
    val corpusDir = Files.createTempDirectory("svd_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("svd_index").toString + "/i"
    val ckpt = Files.createTempDirectory("svd_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamVideoDedup.start(
      input.toDF().toDF("asset_id", "media"), corpusDir, indexDir, ckpt)
    try {
      // batch 0: asset 2 is an in-batch brightness twin of asset 1
      input.addData((1L, vid(0, 10, 20, 30, 40)), (2L, vid(20, 10, 20, 30, 40)),
        (3L, vid(0, 50, 60, 70, 80)))
      q.processAllAvailable()
      // batch 1: asset 4 is a CROSS-BATCH trimmed copy of admitted 3
      // (head frame cut -> jaccard 2/3); asset 5 is fresh
      input.addData((4L, vid(0, 60, 70, 80)), (5L, vid(0, 90, 91, 92, 93)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = StreamVideoDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 5L), admitted.toString)

    // ids increase with arrival order, so batch-mode greedy (min id per
    // cluster) agrees with first-arrival-wins
    val all = Seq((1L, vid(0, 10, 20, 30, 40)), (2L, vid(20, 10, 20, 30, 40)),
      (3L, vid(0, 50, 60, 70, 80)), (4L, vid(0, 60, 70, 80)),
      (5L, vid(0, 90, 91, 92, 93))).toDF("asset_id", "media")
    val oracle = Dedup.videoSurvivors(all).select("asset_id").as[Long].collect().toSet
    assert(admitted == oracle, s"stream $admitted != batch $oracle")

    // index carries one posting per admitted shingle: 3+3+3 2-frame
    // shingles across admitted 1, 3, 5
    assert(spark.read.parquet(indexDir).count() == 9)
  }

  test("replayed micro-batch is idempotent and never self-duplicates") {
    val corpusDir = Files.createTempDirectory("svd_corpus2").toString + "/c"
    val indexDir = Files.createTempDirectory("svd_index2").toString + "/i"
    val b0 = Seq((1L, vid(0, 10, 20, 30)), (2L, vid(0, 40, 50, 60)))
      .toDF("asset_id", "media")
    val b1 = Seq((3L, vid(0, 70, 80, 90)), (4L, vid(20, 10, 20, 30)))
      .toDF("asset_id", "media")
    StreamVideoDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    StreamVideoDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val before = StreamVideoDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(before.toSeq == Seq(1L, 2L, 3L), before.toList.toString)
    // replay batch 1: pruned index read + dynamic overwrite must
    // re-derive the identical admitted set (4 still dropped, 3 kept —
    // NOT dropped as a self-duplicate of its own index rows)
    StreamVideoDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val after = StreamVideoDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(after.sameElements(before), "replay changed the admitted set")
    assert(spark.read.parquet(indexDir)
      .select("video_id").distinct().count() == 3)
  }

  test("cross-container MP4 twin of an admitted GVID is dropped cross-batch") {
    // the streaming gate rides videoFrames' magic dispatch, so an MP4
    // re-mux of an already-admitted GVID must hit the index and drop —
    // the cross-container duplicate class real crawl video arrives as
    val corpusDir = Files.createTempDirectory("svd_corpus4").toString + "/c"
    val indexDir = Files.createTempDirectory("svd_index4").toString + "/i"
    val frames = Seq(10L, 20L, 30L, 40L).map(s => frame(s))
    val b0 = Seq((1L, Codecs.encodeVideo(frames)),
      (2L, vid(0, 50, 60, 70))).toDF("asset_id", "media")
    val b1 = Seq((3L, Codecs.encodeMp4(18, 12, 25, frames)), // re-mux of 1
      (4L, Codecs.encodeAvi(18, 12, 25, Seq(frame(80), frame(81), frame(82)))))
      .toDF("asset_id", "media")
    StreamVideoDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    StreamVideoDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val admitted = StreamVideoDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 4L),
      s"MP4 re-mux must drop against the GVID original: $admitted")
  }

  test("non-video assets pass through unexamined; index holds no row for them") {
    val corpusDir = Files.createTempDirectory("svd_corpus3").toString + "/c"
    val indexDir = Files.createTempDirectory("svd_index3").toString + "/i"
    val still = frame(7)                           // a bare image, not a container
    val short = Codecs.encodeVideo(Seq(frame(8)))  // 1 frame: no temporal evidence
    val b0 = Seq((1L, vid(0, 10, 20, 30)), (2L, "not a video".getBytes),
      (3L, still), (4L, short)).toDF("asset_id", "media")
    StreamVideoDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    val admitted = StreamVideoDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 3L, 4L), admitted.toString)
    assert(spark.read.parquet(indexDir)
      .select("video_id").distinct().count() == 1, "only the real video is indexed")
  }
}
