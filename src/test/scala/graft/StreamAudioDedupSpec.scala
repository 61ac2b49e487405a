package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.{Codecs, Dedup}
import graft.streaming.StreamAudioDedup

/** Streaming perceptual audio dedup (the StreamMediaDedup engine under
  * the ahash front): in-batch and cross-batch twins dropped,
  * single-stream == batch ahashSurvivors, replay idempotent, non-audio
  * assets pass through.
  */
class StreamAudioDedupSpec extends SparkTestBase {
  import spark.implicits._

  // the syntheticAhashAssets base formula; a gain twin multiplies every
  // sample, which preserves every cross-multiplied gradient comparison
  // -> identical hash
  private def clip(seed: Long, gain: Int = 1): Array[Byte] = {
    val m = (seed * 2654435761L) % 1000003L
    val n = (m % 600 + 100).toInt
    Codecs.encodeWav(16000, Array.tabulate(n) { i =>
      val v = i + 7 * m + 1
      ((((v * v % 1000003L) * 2654435761L % 1000003L) % 24001L - 12000L) * gain).toShort
    })
  }

  test("streaming filter == batch ahashSurvivors; cross-batch twins dropped") {
    val corpusDir = Files.createTempDirectory("sad_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("sad_index").toString + "/i"
    val ckpt = Files.createTempDirectory("sad_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamAudioDedup.start(
      input.toDF().toDF("asset_id", "media"), corpusDir, indexDir, ckpt)
    try {
      // batch 0: asset 2 is an in-batch gain twin of asset 1
      input.addData((1L, clip(1)), (2L, clip(1, 2)), (3L, clip(3)))
      q.processAllAvailable()
      // batch 1: asset 4 is a CROSS-BATCH rewrap twin of admitted asset 3
      // (metadata chunk: bytes differ, decode identical); asset 5 fresh
      input.addData(
        (4L, Codecs.insertRiffChunk(clip(3), "LIST", "INFOmeta".getBytes)),
        (5L, clip(5)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = StreamAudioDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 5L), admitted.toString)

    // ids increase with arrival order, so batch-mode greedy (min id per
    // cluster) agrees with first-arrival-wins
    val all = Seq((1L, clip(1)), (2L, clip(1, 2)), (3L, clip(3)),
      (4L, Codecs.insertRiffChunk(clip(3), "LIST", "INFOmeta".getBytes)),
      (5L, clip(5))).toDF("asset_id", "media")
    val oracle = Dedup.ahashSurvivors(all).select("asset_id").as[Long].collect().toSet
    assert(admitted == oracle, s"stream $admitted != batch $oracle")

    // index carries one 8-byte signature per admitted clip
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("replayed micro-batch is idempotent and never self-duplicates") {
    val corpusDir = Files.createTempDirectory("sad_corpus2").toString + "/c"
    val indexDir = Files.createTempDirectory("sad_index2").toString + "/i"
    val b0 = Seq((1L, clip(1)), (2L, clip(2))).toDF("asset_id", "media")
    val b1 = Seq((3L, clip(3)), (4L, clip(1, 2))).toDF("asset_id", "media")
    StreamAudioDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    StreamAudioDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val before = StreamAudioDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(before.toSeq == Seq(1L, 2L, 3L), before.toList.toString)
    // replay batch 1: pruned index read + dynamic overwrite must
    // re-derive the identical admitted set (4 still dropped, 3 kept —
    // NOT dropped as a self-duplicate of its own index rows)
    StreamAudioDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val after = StreamAudioDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(after.sameElements(before), "replay changed the admitted set")
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("non-audio assets pass through unexamined; index holds no row for them") {
    val corpusDir = Files.createTempDirectory("sad_corpus3").toString + "/c"
    val indexDir = Files.createTempDirectory("sad_index3").toString + "/i"
    val img = Codecs.encodePpm(16, 12, (x, y) => (x * 5 % 200, y * 7 % 200, 50))
    val b0 = Seq((1L, clip(1)), (2L, "not audio".getBytes),
      (3L, img)).toDF("asset_id", "media")
    StreamAudioDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    val admitted = StreamAudioDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 3L), admitted.toString)
    assert(spark.read.parquet(indexDir).count() == 1, "only the clip is indexed")
  }
}
