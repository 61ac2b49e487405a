package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.streaming.StreamCluster

/** Streaming cluster gate: assignment == the batch index read, outliers
  * beyond the TRAINING radius quarantined, replay idempotency,
  * empty-batch no-op, save/load roundtrip. */
class StreamClusterSpec extends SparkTestBase {
  import spark.implicits._

  // training corpus: two tight groups around 0 and 1 (1-D in dim 2);
  // radii after convergence: cluster 0 centroid 50 (dist2 2500),
  // cluster 1 centroid 1050 (dist2 2500)
  private def trainDocs: DataFrame = Seq(
    0L -> Array(0.0f, 0.0f), 1L -> Array(0.1f, 0.0f),
    2L -> Array(1.0f, 0.0f), 3L -> Array(1.1f, 0.0f))
    .toDF("vec_id", "embedding")

  private def index(): String = {
    val p = Files.createTempDirectory("kmidx").toString
    Similarity.saveKmeans(trainDocs, p, k = 2, rounds = 4)
    p
  }

  test("save/load roundtrip: index assignment == direct clustering") {
    val p = index()
    val direct = Similarity.kmeansClusters(trainDocs, 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIdx = Similarity.kmeansAssignFromIndex(trainDocs, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIdx == direct)
    // every training vector is inside its own training radius
    assert(Similarity.kmeansAssignFromIndex(trainDocs, p)
      .where(col("outlier")).count() == 0)
  }

  test("stream == batch: in-radius admitted, beyond-radius quarantined") {
    val p = index()
    val root = Files.createTempDirectory("sclus").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamCluster.start(input.toDF().toDF("vec_id", "embedding"),
      p, s"$root/c", s"$root/q", s"$root/ck")
    try {
      // 10: at centroid 0 exactly (dist2 2500 <= radius) -> corpus
      // 11: at 0.08 -> m=80, dist2 = 900 -> corpus
      // 12: far point 5.0 -> dist2 >> radius -> quarantine
      input.addData(10L -> Array(0.05f, 0.0f), 11L -> Array(0.08f, 0.0f))
      q.processAllAvailable()
      input.addData(12L -> Array(5.0f, 0.0f))
      q.processAllAvailable()
    } finally q.stop()
    val corpus = StreamCluster.corpus(spark, s"$root/c").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(corpus.keySet == Set(10L, 11L))
    assert(corpus(10L) == ((0L, 0L)), "50-milli point sits ON centroid 50")
    assert(corpus(11L) == ((0L, 900L)))
    val quar = StreamCluster.quarantine(spark, s"$root/q").collect()
      .map(_.getLong(0)).toSet
    assert(quar == Set(12L))
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val p = index()
    val root = Files.createTempDirectory("sclus_r").toString
    val wave = Seq(10L -> Array(0.05f, 0.0f), 12L -> Array(5.0f, 0.0f))
      .toDF("vec_id", "embedding")
    StreamCluster.gateBatch(wave, 0L, p, s"$root/c", s"$root/q")
    def state() = (
      StreamCluster.corpus(spark, s"$root/c").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      StreamCluster.quarantine(spark, s"$root/q").collect()
        .map(_.getLong(0)).toSet)
    val before = state()
    StreamCluster.gateBatch(wave, 0L, p, s"$root/c", s"$root/q") // replay
    assert(state() == before)
  }

  test("empty batch: no partitions written") {
    val p = index()
    val root = Files.createTempDirectory("sclus_e").toString
    val wave = Seq(10L -> Array(0.05f, 0.0f)).toDF("vec_id", "embedding")
    StreamCluster.gateBatch(wave, 0L, p, s"$root/c", s"$root/q")
    StreamCluster.gateBatch(wave.where(col("vec_id") < 0), 1L,
      p, s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
