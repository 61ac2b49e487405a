package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Codecs, Dedup}
import graft.sources.WebDataset
import graft.streaming.StreamImageDedup

/** WebDataset tar shards as the STREAMING ingest unit: shards written
  * by the export path are consumed by `streamShards` (binaryFile file
  * source, whole shards per micro-batch) and fed straight through the
  * resident image-dedup gate — the end-to-end shape a multimodal
  * corpus actually arrives in. Pins stream == batch over sharded
  * input, and file-source exactly-once (a restarted query on the same
  * checkpoint reprocesses nothing). */
class StreamShardIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def img(seed: Long, shift: Int = 0): Array[Byte] = {
    val m = (seed * 2654435761L) % 1000003L
    Codecs.encodePpm((seed % 16 + 16).toInt, ((seed * 3) % 12 + 12).toInt,
      (x, y) => (
        ((x * (7 + m % 13) + y * (13 + m % 29) + m) % 201 + shift).toInt,
        ((x * (3 + m % 17) + y * (11 + m % 31) + 2 * m) % 201 + shift).toInt,
        ((x * (5 + m % 19) + y * (17 + m % 37) + 3 * m) % 201 + shift).toInt))
  }

  test("shards stream through the image-dedup gate; == batch; restart reprocesses nothing") {
    val root = Files.createTempDirectory("wds_stream").toString
    val corpusDir = s"$root/corpus"
    val indexDir = s"$root/index"
    val ckpt = s"$root/ckpt"
    // wave 1: asset 2 is a brightness twin of 1; wave 2: asset 4 is a
    // cross-shard twin of admitted 3, asset 5 fresh
    val wave1 = Seq((1L, img(1)), (2L, img(1, 20)), (3L, img(3)))
    val wave2 = Seq((4L, img(3, 20)), (5L, img(5)))
    WebDataset.writeShards(wave1.toDF("asset_id", "media"),
      s"$root/in/wave1", perShard = 2)
    def startGate() = StreamImageDedup.start(
      WebDataset.streamShards(spark, s"$root/in/wave*")
        .where(col("ext") === "img")
        .select(col("key").cast("long").as("asset_id"),
          col("data").as("media")),
      corpusDir, indexDir, ckpt)
    val q = startGate()
    try {
      q.processAllAvailable()
      WebDataset.writeShards(wave2.toDF("asset_id", "media"),
        s"$root/in/wave2", perShard = 2)
      q.processAllAvailable()
    } finally q.stop()
    val admitted = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted.toSeq
    // == the one-shot batch filter over the union of both waves
    val batch = Dedup.dhashSurvivors((wave1 ++ wave2).toDF("asset_id", "media"))
      .select("asset_id").as[Long].collect().sorted.toSeq
    assert(admitted == batch)
    assert(admitted == Seq(1L, 3L, 5L)) // twins 2 and 4 dropped
    // media round-trips bit-exact through shard -> gate -> corpus
    val m3 = StreamImageDedup.corpus(spark, corpusDir)
      .where(col("asset_id") === 3L).select("media")
      .head().getAs[Array[Byte]](0)
    assert(m3.sameElements(img(3)))
    // exactly-once: a fresh query on the same checkpoint sees both
    // waves committed and reprocesses nothing
    val q2 = startGate()
    try q2.processAllAvailable() finally q2.stop()
    val after = StreamImageDedup.corpus(spark, corpusDir)
      .select("asset_id").as[Long].collect().sorted.toSeq
    assert(after == admitted)
  }

  test("a corrupt shard yields zero rows and does not poison the stream") {
    val root = Files.createTempDirectory("wds_corrupt").toString
    WebDataset.writeShards(Seq((1L, img(1))).toDF("asset_id", "media"),
      s"$root/in", perShard = 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in/shard-999999.tar"),
      "definitely not a tar".getBytes)
    val q = StreamImageDedup.start(
      WebDataset.streamShards(spark, s"$root/in")
        .where(col("ext") === "img")
        .select(col("key").cast("long").as("asset_id"),
          col("data").as("media")),
      s"$root/c", s"$root/i", s"$root/ck")
    try q.processAllAvailable() finally q.stop()
    assert(StreamImageDedup.corpus(spark, s"$root/c")
      .select("asset_id").as[Long].collect().toSeq == Seq(1L))
  }
}
