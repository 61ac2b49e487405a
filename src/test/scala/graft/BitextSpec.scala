package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class BitextSpec extends SparkTestBase {
  import spark.implicits._

  test("bitextMargin surfaces planted scaled twins as the mined pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val twins = emb.where(col("vec_id") % 2 === 1 && col("vec_id") < 16)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), v => v * lit(2.0f)).as("embedding"))
    val x = emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 120)
      .select(col("vec_id"), col("embedding"))
      .unionByName(twins)
    val mined = Similarity.bitextMargin(x, emb.where(col("vec_id") % 2 === 1), k = 4)
    val byX = mined.collect().map(r => r.getLong(0) -> r).toMap
    // every twin 1000000+j must mine its source j with exact cos 1.0
    (1L to 15L by 2L).foreach { j =>
      val r = byX.get(1000000L + j)
      assert(r.isDefined, s"twin $j not mined")
      assert(r.get.getLong(1) == j, s"twin $j aligned to ${r.get.getLong(1)}")
      assert(r.get.getLong(2) == 1000L, "exact scaled copy reads cos 1.000")
      assert(r.get.getLong(3) >= 1000000L)
    }
    // at most one row per source, margins all above the gate
    assert(mined.groupBy("xid").count().where(col("count") > 1).isEmpty)
    assert(mined.where(col("margin_ppm") < 1000000L).isEmpty)
  }

  test("hand-computed margin on a 3-vector toy problem") {
    // x1 = (1,0), targets: y1 = (1,0) cos 1.0, y2 = (0.8, 0.6) cos 0.8,
    // y3 = (0,1) cos 0.0 (dropped: cm not > 0)
    val src = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bitextMargin(src, tgt, k = 2, minMarginPpm = 0L)
      .collect()
    // sx = top2 of {1000, 800, 0} = 1800; sy(y1) = top2 over X = {1000} = 1000
    // margin(x1,y1) = (1e6 * 4 * 1000) div (1800 + 1000) = 1428571
    assert(got.length == 1)
    assert(got.head.getLong(1) == 1L)
    assert(got.head.getLong(2) == 1000L)
    assert(got.head.getLong(3) == 4000000000L / 2800L, got.head.toString)
  }

  test("hub deflation: a dense-neighborhood target loses the margin race") {
    // RAW cosine prefers the hub for x1 (cos ~.900 vs ~.889), but the
    // hub's neighborhood is dense (x2/x3 read ~.995 against it) so its
    // margin denominator inflates and the ratio picks the partner:
    //   margin(x1,hub) ~ 2*900/(900+995) = .950
    //   margin(x1,p)   ~ 2*889/(900+889) = .994
    val src = Seq(
      (1L, Seq(0.9f, 0.0f, 0.43589f)),
      (2L, Seq(0.995f, 0.0998f, 0.0f)),
      (3L, Seq(0.995f, -0.0998f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f)),   // hub: ~.900/.995/.995 vs sources
      (20L, Seq(0.6f, 0.0f, 0.8f))).toDF("vec_id", "embedding") // x1 only
    val got = Similarity.bitextMargin(src, tgt, k = 1, minMarginPpm = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 10L && got(3L) == 10L, "hub is still x2/x3's best")
    assert(got(1L) == 20L, s"hubness not deflated: aligned ${got(1L)}")
  }

  test("bitextMargin releases its candidate cache before returning") {
    // the |X|·|Y| candidate frame is persist()ed internally; the result
    // must come back materialized with that cache RELEASED (the
    // materializeAndRelease lifecycle rule) — a lazy return would pin it
    // in the CacheManager for the life of the session. The only persistent
    // RDD the call may add is the localCheckpoint of its own result.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val src = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bitextMargin(src, tgt, k = 1, minMarginPpm = 0L)
    assert(out.count() == 1L)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked cached RDDs beyond the checkpoint: $added")
  }
}
