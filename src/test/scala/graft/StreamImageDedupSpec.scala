package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Dedup}
import graft.streaming.StreamImageDedup

/** Streaming perceptual image dedup: in-batch and cross-batch twins
  * dropped, single-stream == batch dhashSurvivors, replay idempotent,
  * non-image assets pass through.
  */
class StreamImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  // distinct slope tuples per seed (the aperiodicity discipline of
  // syntheticDhashAssets); a "shifted" twin adds +20 per channel, which
  // preserves every gradient sign -> identical dHash
  private def img(seed: Long, shift: Int = 0): Array[Byte] = {
    val m = (seed * 2654435761L) % 1000003L
    Codecs.encodePpm((seed % 16 + 16).toInt, ((seed * 3) % 12 + 12).toInt,
      (x, y) => (
        ((x * (7 + m % 13) + y * (13 + m % 29) + m) % 201 + shift).toInt,
        ((x * (3 + m % 17) + y * (11 + m % 31) + 2 * m) % 201 + shift).toInt,
        ((x * (5 + m % 19) + y * (17 + m % 37) + 3 * m) % 201 + shift).toInt))
  }

  test("streaming filter == batch dhashSurvivors; cross-batch twins dropped") {
    val corpusDir = Files.createTempDirectory("sid_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("sid_index").toString + "/i"
    val ckpt = Files.createTempDirectory("sid_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamImageDedup.start(
      input.toDF().toDF("asset_id", "media"), corpusDir, indexDir, ckpt)
    try {
      // batch 0: asset 2 is an in-batch brightness twin of asset 1
      input.addData((1L, img(1)), (2L, img(1, 20)), (3L, img(3)))
      q.processAllAvailable()
      // batch 1: asset 4 is a CROSS-BATCH twin of admitted asset 3;
      // asset 5 is fresh
      input.addData((4L, img(3, 20)), (5L, img(5)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 5L), admitted.toString)

    // ids increase with arrival order, so batch-mode greedy (min id per
    // cluster) agrees with first-arrival-wins
    val all = Seq((1L, img(1)), (2L, img(1, 20)), (3L, img(3)),
      (4L, img(3, 20)), (5L, img(5))).toDF("asset_id", "media")
    val oracle = Dedup.dhashSurvivors(all).select("asset_id").as[Long].collect().toSet
    assert(admitted == oracle, s"stream $admitted != batch $oracle")

    // index carries one 8-byte signature per admitted image
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("replayed micro-batch is idempotent and never self-duplicates") {
    val corpusDir = Files.createTempDirectory("sid_corpus2").toString + "/c"
    val indexDir = Files.createTempDirectory("sid_index2").toString + "/i"
    val b0 = Seq((1L, img(1)), (2L, img(2))).toDF("asset_id", "media")
    val b1 = Seq((3L, img(3)), (4L, img(1, 20))).toDF("asset_id", "media")
    StreamImageDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    StreamImageDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val before = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(before.toSeq == Seq(1L, 2L, 3L), before.toList.toString)
    // replay batch 1: pruned index read + dynamic overwrite must
    // re-derive the identical admitted set (4 still dropped, 3 kept —
    // NOT dropped as a self-duplicate of its own index rows)
    StreamImageDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val after = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted
    assert(after.sameElements(before), "replay changed the admitted set")
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("non-image assets pass through unexamined; index holds no row for them") {
    val corpusDir = Files.createTempDirectory("sid_corpus3").toString + "/c"
    val indexDir = Files.createTempDirectory("sid_index3").toString + "/i"
    val wav = Codecs.encodeWav(16000, Array.tabulate(64)(i => (i * 100).toShort))
    val b0 = Seq((1L, img(1)), (2L, "not an image".getBytes),
      (3L, wav)).toDF("asset_id", "media")
    StreamImageDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    val admitted = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 3L), admitted.toString)
    assert(spark.read.parquet(indexDir).count() == 1, "only the image is indexed")
  }
}
