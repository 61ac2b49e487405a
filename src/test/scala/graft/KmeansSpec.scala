package graft

import graft.ops.Similarity

/** Distributed Lloyd's k-means (q207): hand-traced rounds, the
  * lowest-cid tie rule, truncating (not flooring) negative centroid
  * means, and empty-cluster retention. */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  private def run(vs: Seq[(Long, Array[Float])], k: Int, rounds: Int) =
    Similarity.kmeansClusters(vs.toDF("vec_id", "embedding"), k, rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("two separated pairs converge to their means (hand-traced 4 rounds)") {
    // m = 0, 100, 1000, 1100 (1-D in a 2-dim array); init c = {0, 100}
    // r1: {0} vs {100,1000,1100} -> c1 = 2200/3 = 733
    // r2: {0,100} vs {1000,1100} -> c0 = 50, c1 = 1050
    // r3, r4: stable. Final dist2 = 2500 for every vector.
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.1f, 0.0f),
      2L -> Array(1.0f, 0.0f), 3L -> Array(1.1f, 0.0f))
    val got = run(vs, k = 2, rounds = 4)
    assert(got == Map(
      0L -> (0L, 2500L), 1L -> (0L, 2500L),
      2L -> (1L, 2500L), 3L -> (1L, 2500L)))
  }

  test("equidistant vectors break ties to the lowest cid") {
    // init c = {0, 1000}; the 500 point is 250000 from both -> cluster 0
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(1.0f, 0.0f),
      2L -> Array(0.5f, 0.0f))
    val got = run(vs, k = 2, rounds = 1)
    assert(got(2L)._1 == 0L, "tie must go to the lowest cid")
  }

  test("negative centroid means truncate toward zero (div parity, not floor)") {
    // k=1: all three in c0; mean of (0, -500, -600) = -1100/3 -> -366
    // (floor would give -367). Final dist2 against (-366, 0):
    //   0 -> 366^2 = 133956, -500 -> 134^2 = 17956, -600 -> 234^2 = 54756
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(-0.5f, 0.0f),
      2L -> Array(-0.6f, 0.0f))
    val got = run(vs, k = 1, rounds = 1)
    assert(got == Map(
      0L -> (0L, 133956L), 1L -> (0L, 17956L), 2L -> (0L, 54756L)))
  }

  test("migrating membership stabilizes (hand-traced)") {
    // m = 0, 100, 200, 900; init c = {0, 100}.
    // r1: {0} vs {100, 200, 900} -> c0 = 0, c1 = 1200/3 = 400
    // r2: 200 is 40000 from BOTH (tie -> c0): {0,100,200} vs {900}
    //     -> c0 = 100, c1 = 900
    // r3, r4: stable.
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.1f, 0.0f),
      2L -> Array(0.2f, 0.0f), 3L -> Array(0.9f, 0.0f))
    val got = run(vs, k = 2, rounds = 4)
    assert(got == Map(
      0L -> (0L, 10000L), 1L -> (0L, 0L),
      2L -> (0L, 10000L), 3L -> (1L, 0L)))
  }

  test("a cluster that loses every vector keeps its previous centroid") {
    // duplicate init rows: c0 = c1 = 0, so round 1 ties EVERYTHING to
    // c0 and c1 is empty -> c1 must stay 0 (not NaN/0-div).
    // r1: all -> c0; c0 = 300/3 = 100, c1 = 0 (retained)
    // r2: 0,0 -> c1 (dist 0 beats 10000); 300 -> c0 (40000 vs 90000)
    //     -> c0 = 300, c1 = 0
    // final assignment under {300, 0}: ids 0,1 -> c1 d2=0; id 2 -> c0 d2=0
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.0f, 0.0f),
      2L -> Array(0.3f, 0.0f))
    val got = run(vs, k = 2, rounds = 2)
    assert(got == Map(
      0L -> (1L, 0L), 1L -> (1L, 0L), 2L -> (0L, 0L)))
  }

  test("corpus smaller than k is rejected loudly") {
    intercept[IllegalArgumentException] {
      run(Seq(0L -> Array(0.0f, 0.0f)), k = 2, rounds = 1)
    }
  }

  test("clusterReport: counts, inertia, prototype argmin with id tie, radius") {
    // first fixture: clusters {0,1} d2=2500 each and {2,3} d2=2500 each
    // -> prototype = LOWEST id at the tied min dist
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.1f, 0.0f),
      2L -> Array(1.0f, 0.0f), 3L -> Array(1.1f, 0.0f))
    val rep = Similarity.clusterReport(
      Similarity.kmeansClusters(vs.toDF("vec_id", "embedding"), 2, 4))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rep(0L) == (2L, 5000L, 0L, 2500L, 2500L))
    assert(rep(1L) == (2L, 5000L, 2L, 2500L, 2500L))
  }

  test("clusterCoreset: waterfilled quotas, prototype-first picks, exact size") {
    // final clusters (see migrating-membership trace): c0 = {0,1,2}
    // around 100, c1 = {3} at 900. Budget = 50% of 4 = 2. Waterfill
    // over sizes (3, 1): c1 saturates with 1, c0's quota = 1 ->
    // prototypes only: id 1 (dist2 0) and id 3 (dist2 0).
    val vs = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.1f, 0.0f),
      2L -> Array(0.2f, 0.0f), 3L -> Array(0.9f, 0.0f))
    val got = Similarity.clusterCoreset(vs.toDF("vec_id", "embedding"),
      budgetPpm = 500000L, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 0L, 0L, 0L), (3L, 1L, 0L, 0L)))
  }

  test("clusterCoreset size equals the exact integer budget") {
    val vs = (0L until 60L).map(i =>
      (i, Array((i % 9) / 10.0f, (i % 5) / 10.0f)))
    for (ppm <- Seq(250000L, 500000L, 900000L)) {
      val n = Similarity.clusterCoreset(vs.toDF("vec_id", "embedding"),
        budgetPpm = ppm, k = 3, rounds = 3).count()
      assert(n == 60L * ppm / 1000000L, s"ppm=$ppm")
    }
  }

  test("KmeansKey kernel: null dims carry no term (SUM-skip), ragged vectors NULL") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
    val df = spark.sql(
      """SELECT m FROM VALUES
        |  (array(cast(null as bigint), 100L)),
        |  (array(0L, 100L)),
        |  (array(0L)) t(m)""".stripMargin)
    // k=2 centroids (0,0) and (100,100); key = d2*2 + cid
    val key = CB.column(graft.expr.KmeansKey(
      CB.expression(col("m")), Seq(Seq(0L, 0L), Seq(100L, 100L))))
    val got = df.select(key.as("k")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    // (null,100): c0 d2 = 100^2 (null dim skipped), c1 d2 = 0 -> key 1
    // (0,100):    c0 d2 = 10000 -> key 20000; c1 d2 = 10000 -> key 20001
    // (0):        dimension mismatch -> NULL
    assert(got == Seq(Some(1L), Some(20000L), None))
  }

  test("kmeansClustersKcenter: farthest-point traversal seeds, then Lloyd's groups") {
    // seed walk: id 0 (lowest), then 2 (farthest from 0), then 4
    // (max min-dist to {0, 2}: 25 vs id 3's 1 and id 1's 0.01)
    val vs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
      (2L, Array(10.0f, 10.0f)), (3L, Array(10.0f, 9.0f)),
      (4L, Array(0.0f, 5.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansClustersKcenter(vs, k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster id IS the seed pick order: 0 -> origin, 1 -> (10,10),
    // 2 -> (0,5); after Lloyd: {0,1} origin, {2,3} top, {4} alone
    assert(got(0L) == 0L && got(1L) == 0L)
    assert(got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 2L)
    // id-order seeding on the same data starts all three seeds in the
    // origin region — the pathology k-center exists to avoid; both
    // still assign every row
    assert(Similarity.kmeansClusters(vs, k = 3, rounds = 2).count() == 5)
  }

  test("kmeansClusters: ragged vectors drop from training and assign NULL, never crash") {
    // one 1-d vector among 2-d ones: the KmeansKey contract says a
    // dimension mismatch is a droppable row, not a crash mid-job —
    // the training groupBy must skip its NULL cid (getLong on a NULL
    // group NPE'd on the driver before the fix)
    val vs = (0L until 12L).map(i =>
      (i, Array((i % 3).toFloat, (i % 4).toFloat))) :+
      (99L, Array(1.0f))
    val got = Similarity.kmeansClusters(vs.toDF("vec_id", "embedding"),
      k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == 13)
    assert(got(99L).isEmpty, "ragged row assigns NULL cluster")
    assert((0L until 12L).forall(got(_).isDefined), "clean rows all assigned")
  }

  test("clusterReport rejects ids outside the packable range loudly") {
    val bad = Seq((1L << 24, Array(0.0f, 0.0f)), (0L, Array(0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.clusterReport(
        Similarity.kmeansClusters(bad, 1, 1)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("persistCorpus is value-identical for both trainers") {
    // cache RELEASE is enforced in code (unpersist before the lazy
    // assignment returns) and cannot be asserted via global
    // CacheManager emptiness here: suites share one session and run
    // concurrently, so another suite's transient persist races any
    // global-emptiness read (observed flaking in the full run)
    val rnd = new scala.util.Random(19)
    val emb = (0L until 64L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
      .localCheckpoint(true) // pin the fixture: rand would re-roll per scan
    def run(p: Boolean) = Similarity.kmeansClusters(emb, 4, 3,
        persistCorpus = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(false) == run(true),
      "persistCorpus must not change a single value")
    val kc = Similarity.kmeansClustersKcenter(emb, 4, 3, persistCorpus = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kc == Similarity.kmeansClustersKcenter(emb, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
