package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Dedup
import graft.streaming.StreamNearDedup

class StreamNearDedupSpec extends SparkTestBase {
  import spark.implicits._

  // ~40 distinct 3-shingles per doc; a twin differs in one trailing word,
  // so twin-jaccard >> 0.7 while unrelated docs share nothing
  private def doc(seed: Int, tail: String = "end"): String =
    (0 until 40).map(i => s"w${seed}_$i").mkString(" ") + " " + tail

  test("streaming filter == batch minhashSurvivors; cross-batch dups dropped") {
    val corpusDir = Files.createTempDirectory("snd_corpus").toString + "/c"
    val indexDir = Files.createTempDirectory("snd_index").toString + "/i"
    val ckpt = Files.createTempDirectory("snd_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDedup.start(
      input.toDF().toDF("doc_id", "text"), corpusDir, indexDir, ckpt)
    try {
      // batch 0: doc 2 is an in-batch twin of doc 1
      input.addData((1L, doc(1)), (2L, doc(1, "altered")), (3L, doc(3)))
      q.processAllAvailable()
      // batch 1: doc 4 is a cross-batch twin of doc 3; doc 5 is fresh
      input.addData((4L, doc(3, "altered")), (5L, doc(5)))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = StreamNearDedup.corpus(spark, corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L, 5L), admitted.toString)

    // ids increase with arrival order, so the batch-mode greedy
    // (keep min doc_id per cluster) must agree with first-arrival-wins
    val all = Seq((1L, doc(1)), (2L, doc(1, "altered")), (3L, doc(3)),
      (4L, doc(3, "altered")), (5L, doc(5))).toDF("doc_id", "text")
    val oracle = Dedup.minhashSurvivors(all).select("doc_id").as[Long].collect().toSet
    assert(admitted == oracle, s"stream $admitted != batch $oracle")

    // index only carries survivors, one row per admitted doc
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("replayed micro-batch is idempotent and never self-duplicates") {
    val corpusDir = Files.createTempDirectory("snd_corpus2").toString + "/c"
    val indexDir = Files.createTempDirectory("snd_index2").toString + "/i"
    val b0 = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val b1 = Seq((3L, doc(2, "altered")), (4L, doc(4))).toDF("doc_id", "text")

    StreamNearDedup.dedupBatch(b0, 0L, corpusDir, indexDir)
    StreamNearDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val first = StreamNearDedup.corpus(spark, corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L, 4L), first.toString)

    // replay batch 1 (restart between foreachBatch and offset commit): the
    // `_batch < batchId` index filter hides batch 1's own rows, so doc 4
    // must survive again rather than matching itself; dynamic overwrite
    // rewrites the partition instead of appending
    StreamNearDedup.dedupBatch(b1, 1L, corpusDir, indexDir)
    val replayed = StreamNearDedup.corpus(spark, corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(replayed == first, s"replay changed corpus: $replayed")
    assert(spark.read.parquet(indexDir).count() == 3)
  }

  test("compactIndex: content preserved, partitions collapse, future batches still dedup") {
    val corpusDir = Files.createTempDirectory("snd_corpus3").toString + "/c"
    val indexDir = Files.createTempDirectory("snd_index3").toString + "/i"
    StreamNearDedup.dedupBatch(Seq((1L, doc(1))).toDF("doc_id", "text"), 0L, corpusDir, indexDir)
    StreamNearDedup.dedupBatch(Seq((2L, doc(2))).toDF("doc_id", "text"), 1L, corpusDir, indexDir)
    StreamNearDedup.dedupBatch(Seq((3L, doc(3))).toDF("doc_id", "text"), 2L, corpusDir, indexDir)
    val before = spark.read.parquet(indexDir)
      .select("doc_id").as[Long].collect().toSet

    // batches 0..2 are checkpoint-committed here, so all are compactable
    StreamNearDedup.compactIndex(spark, indexDir, upTo = 2L)
    val idx = spark.read.parquet(indexDir)
    assert(idx.select("doc_id").as[Long].collect().toSet == before)
    val parts = idx.select("_batch").distinct().as[Long].collect().toSet
    assert(parts == Set(0L), s"expected one compacted partition, got $parts")

    // the compacted index still gates new arrivals: a twin of the
    // batch-0 doc must be dropped by batch 3
    StreamNearDedup.dedupBatch(
      Seq((4L, doc(1, "altered")), (5L, doc(5))).toDF("doc_id", "text"),
      3L, corpusDir, indexDir)
    val admitted = StreamNearDedup.corpus(spark, corpusDir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 3L, 5L), admitted.toString)
  }
}
