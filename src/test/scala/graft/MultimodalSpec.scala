package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "an image asset"), (1L, "an audio asset"), (2L, "a video asset"),
    (3L, "x"), (4L, ""), (5L, "another video here")
  ).toDF("doc_id", "text")

  test("assets: binary media + deterministic media_type cycle") {
    val a = Multimodal.assets(docs).orderBy("asset_id").collect()
    assert(a.map(_.getAs[String]("media_type")).toList ==
      List("image", "audio", "video", "image", "audio", "video"))
    assert(new String(a(0).getAs[Array[Byte]]("media"), "UTF-8") == "an image asset")
  }

  test("metadata: modality-dependent nullable fields") {
    val m = Multimodal.metadata(Multimodal.assets(docs)).orderBy("asset_id").collect()
    val img = m(0); val aud = m(1); val vid = m(2)
    assert(img.getAs[Int]("n_bytes") == 14)
    assert(img.getAs[Int]("width") == 14 % 640 + 16)
    assert(img.isNullAt(img.fieldIndex("duration_ms")), "images have no duration")
    assert(img.isNullAt(img.fieldIndex("sample_rate")))
    assert(aud.getAs[Int]("sample_rate") == 16000)
    assert(aud.isNullAt(aud.fieldIndex("width")))
    assert(vid.getAs[Int]("duration_ms") == (13 * 13) % 60000 + 1000)
  }

  test("frameSamples: video-only, inclusive sequence, positional frame_idx") {
    val docs2 = Seq((2L, "a" * 100)).toDF("doc_id", "text") // video; duration = 1300+1000 = 2300
    val f = Multimodal.frameSamples(Multimodal.assets(docs2), everyMs = 1000)
      .orderBy("frame_idx").collect()
    assert(f.map(_.getAs[Int]("offset_ms")).toList == List(0, 1000, 2000))
    assert(f.map(_.getAs[Int]("frame_idx")).toList == List(0, 1, 2))
  }

  test("split storage: metadata scans never touch media files; join restores payloads") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    val a = Multimodal.assets(docs)
    Multimodal.writeSplit(a, tmp)
    val meta = Multimodal.readMetadata(spark, tmp)
    assert(!meta.columns.contains("media"))
    // metadata-only query scans only the metadata table's files
    val scanned = meta.where(col("media_type") === "video")
      .queryExecution.executedPlan.toString
    assert(scanned.contains("metadata") && !scanned.contains(s"$tmp/media"))
    // selecting media for a filtered set joins back losslessly
    val sel = meta.where(col("asset_id") === 2L)
    val joined = Multimodal.readWithMedia(spark, tmp, sel).collect()
    assert(joined.length == 1)
    assert(new String(joined.head.getAs[Array[Byte]]("media"), "UTF-8") == "a video asset")
  }

  test("decodeFeatures: deterministic, partitioning- and batch-size-independent, unit L1") {
    val big = (0L until 100L).map(i => (i, s"payload $i ${"abc" * (i % 7).toInt}")).toDF("doc_id", "text")
    val a = Multimodal.assets(big)
    def run(parts: Int, batch: Int) =
      Multimodal.decodeFeatures(spark, a.repartition(parts), batchSize = batch)
        .orderBy("asset_id").as[(Long, Seq[Float])].collect().toSeq
    val r1 = run(1, 64); val r2 = run(7, 3)
    assert(r1 == r2, "features must not depend on physical partitioning or batch shape")
    assert(r1.forall { case (_, f) => math.abs(f.sum - 1f) < 1e-5 }, "histogram is L1-normalized")
    assert(r1.forall(_._2.length == 16))
  }
}
