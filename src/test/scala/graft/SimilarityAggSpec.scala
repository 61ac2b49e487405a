package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Aggregate}

class SimilarityAggSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")

  test("quantizeInt8: codes in [-127,127], round-trip error <= s/2, zero vector safe") {
    val d = vecs(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(3f, 2f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f)),   // all-zero: must not divide by zero
      (4L, Array(-0.001f, 0.002f, 0.0005f, -0.0015f)))
    val got = graft.ops.Similarity.quantizeInt8(d)
      .as[(Long, Long, Array[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(3L)._1 == 0L && got(3L)._2.forall(_ == 0), "zero vector quantizes to zeros")
    // certificate: every code within range; dequantized value within s/2
    val orig = Map(
      1L -> Array(0.5, -1.0, 0.25, 0.125),
      2L -> Array(3.0, 2.0, 1.0, 0.0),
      4L -> Array(-0.001, 0.002, 0.0005, -0.0015))
    for ((id, (scaleE9, codes)) <- got if id != 3L) {
      val s = scaleE9 / 1e9
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      // s is reconstructed from its 1e-9 fixed-point form, which shifts
      // the dequantization grid by up to 127 * 0.5e-9 — allow that slack
      orig(id).zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * s) <= s / 2 + 127 * 0.5e-9 + 1e-12,
          s"vec $id: |$x - $c*$s| exceeds s/2")
      }
      // the max-magnitude component maps to ±127 exactly
      val maxIdx = orig(id).map(math.abs).zipWithIndex.maxBy(_._1)._2
      assert(math.abs(codes(maxIdx)) == 127, s"vec $id max component must hit ±127")
    }
  }

  test("bruteForceKnn: hand-checkable neighbor order, self excluded") {
    val d = vecs(
      (0L, Array(1f, 0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0f, 1f)))       // farthest from 0
    val got = Similarity.bruteForceKnn(d.where($"vec_id" === 0), d, k = 3)
      .orderBy("rank").select("nid").as[Long].collect().toList
    assert(got == List(1L, 2L, 3L))
  }

  test("lshKnn returns ranked same-bucket neighbors consistent with exact cosine") {
    // clustered vectors so bucket sharing is likely within a cluster
    val cluster1 = (0L to 4L).map(i => (i, Array.tabulate(8)(j => (math.cos(j) + i * 1e-3).toFloat)))
    val cluster2 = (10L to 14L).map(i => (i, Array.tabulate(8)(j => (-math.cos(2 * j) + (i - 10) * 1e-3).toFloat)))
    val d = vecs((cluster1 ++ cluster2): _*)
    val got = Similarity.lshKnn(d.where($"vec_id" === 0), d, k = 3, planes = 2)
    val rows = got.orderBy("rank").collect()
    assert(rows.nonEmpty, "query must find same-bucket neighbors")
    // ranks are 1..n without gaps and sims are non-increasing
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    assert(rows.map(_.getAs[Int]("rank")).toList == (1 to rows.length).toList)
  }

  test("multi-probe LSH recall >= single-probe recall, both vs brute force") {
    val d = vecs((0L until 200L).map(i =>
      (i, Array.tabulate(12)(j => (math.sin(i * 0.37 + j * 1.1) + math.cos(i * 0.05)).toFloat))): _*)
    val queries = d.where($"vec_id" < 10)
    val exact = graft.ops.Similarity.bruteForceKnn(queries, d, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recall(probeFlips: Int): Double = {
      val got = graft.ops.Similarity.lshKnn(queries, d, k = 5, planes = 6,
        probeFlips = probeFlips).select("qid", "nid").as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val r0 = recall(0); val r6 = recall(6)
    assert(r6 >= r0, s"multi-probe recall $r6 < single-probe $r0")
    assert(r6 > 0.5, s"multi-probe recall too low: $r6")
  }

  test("ivfKnn: well-formed ranks; full-probe IVF equals brute force") {
    val d = vecs((0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 0.7 + j) * (1 + (i % 5) * 0.1)).toFloat))): _*)
    val centroids = graft.ops.Similarity.fitCentroids(d, nlist = 4)
    assert(centroids.length == 4 && centroids.forall(_.length == 8))
    val queries = d.where($"vec_id" < 3)
    // nprobe = nlist => every list probed => identical to exact knn
    val full = graft.ops.Similarity.ivfKnn(queries, d, centroids, k = 5, nprobe = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = graft.ops.Similarity.bruteForceKnn(queries, d, k = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(full == exact, "nprobe=nlist must reduce to exact search")
    // partial probe: ranks contiguous from 1, results subset of same-probe space
    val part = graft.ops.Similarity.ivfKnn(queries, d, centroids, k = 5, nprobe = 2)
      .orderBy("qid", "rank").collect()
    val byQ = part.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(rs => rs.map(_.getAs[Int]("rank")).toList == (1 to rs.length).toList))
  }

  test("semDedup: identical twins dropped, distinct vectors all survive") {
    // 40 well-separated random-ish unit vectors + identical twins of the
    // multiples of 4, twin ids offset by 1000
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (i, v.map(_ / n))
    }
    val twins = base.filter(_._1 % 4 == 0).map { case (i, v) => (i + 1000L, v) }
    val df = vecs((base ++ twins): _*)
    val survivors = Similarity.semDedup(df, nlist = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == base.map(_._1).toSet,
      s"exactly the twins must be dropped, got $survivors")
    // corpus with no near pairs at tau: nothing dropped
    val clean = Similarity.semDedup(vecs(base: _*), nlist = 4).count()
    assert(clean == 40L)
  }

  test("semDedup: degenerate one-cluster corpus trips the pair-count guard") {
    // 200 copies of the same vector -> one cluster, 19900 pairs > cap
    val one = Array(1f, 0f, 0f, 0f)
    val df = vecs((0L until 200L).map(i => (i, one)): _*)
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedup(df, nlist = 4, maxPairsPerCluster = 1000L)
    }
    assert(e.getMessage.contains("candidate pairs"))
  }

  test("truncateDims: prefix slice; cosine ranking is scale-invariant on the prefix") {
    // v2's 2-dim prefix is parallel to v1's (cosine 1) even though the
    // full vectors are not; v3's prefix is orthogonal to v1's
    val d = vecs(
      (1L, Array(1f, 0f, 5f, 5f)),
      (2L, Array(2f, 0f, -9f, 3f)),
      (3L, Array(0f, 1f, 5f, 5f)))
    val t = Similarity.truncateDims(d, 2)
    assert(t.where($"vec_id" === 1).select($"embedding").as[Array[Float]].head()
      .toSeq == Seq(1f, 0f))
    val top = Similarity.bruteForceKnn(t.where($"vec_id" === 1), t, k = 2)
      .orderBy($"rank").select($"nid").as[Long].collect().toSeq
    assert(top == Seq(2L, 3L), top.toString) // prefix-parallel 2 beats orthogonal 3
    // scaling any vector leaves the truncated ranking unchanged
    val scaled = d.withColumn("embedding",
      transform($"embedding", x => x * lit(7.0f)))
    val topScaled = Similarity.bruteForceKnn(
      Similarity.truncateDims(scaled, 2).where($"vec_id" === 1),
      Similarity.truncateDims(scaled, 2), k = 2)
      .orderBy($"rank").select($"nid").as[Long].collect().toSeq
    assert(topScaled == top)
  }

  test("bqPack: sign bits in order; scaling-invariant; >64 dims null") {
    import graft.expr.Exprs
    val d = vecs((1L, Array(0.5f, -1f, 0f, -0.25f))) // bits: 1,0,1,0 -> 0b0101
    val sig = d.select(Exprs.bqPack($"embedding")).as[Long].head()
    assert(sig == 5L, sig.toString)
    val scaled = d.select(Exprs.bqPack(transform($"embedding", x => x * lit(9f))))
      .as[Long].head()
    assert(scaled == sig) // positive scaling preserves every sign bit
    val big = Seq((1L, Array.fill(65)(1f))).toDF("vec_id", "embedding")
    assert(big.select(Exprs.bqPack($"embedding")).as[Option[Long]].head().isEmpty)
  }

  test("bqKnn: full-corpus shortlist equals brute force; scaled copy is top-1") {
    val d = vecs((0L until 12L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 3.7 + j * 1.3).toFloat))): _*)
    val q = d.where($"vec_id" < 3)
    val exact = Similarity.bruteForceKnn(q, d, k = 3).as[(Long, Long, Int)]
      .collect().toSet
    val bq = Similarity.bqKnn(q, d, k = 3, shortlist = 12)
      .as[(Long, Long, Int)].collect().toSet
    assert(bq == exact, s"$bq != $exact") // shortlist >= corpus -> same ranking
    // scaled copy retrieves its source as top-1 through the Hamming-0 path
    val probe = d.where($"vec_id" === 7).select(lit(99L).as("vec_id"),
      transform($"embedding", x => x * lit(3f)).as("embedding"))
    val top1 = Similarity.bqKnn(probe, d, k = 1, shortlist = 4)
      .select($"nid").as[Long].head()
    assert(top1 == 7L, top1.toString)
  }

  test("slidingCount keeps only the trailing window relative to max ts") {
    val d = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:11:00"), 7L),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:11:00"), 8L)
    ).toDF("event_id", "ts", "user_id")
    val got = Aggregate.slidingCount(d, "user_id", "ts", windowMinutes = 10)
      .orderBy("content_id").as[(String, Long)].collect().toList
    // window = [00:01:00, 00:11:00]: events 2,3 for user 7; event 4 for user 8
    assert(got == List(("7", 2L), ("8", 1L)))
  }

  test("leaderboard: ordered by count desc then key, limited to k") {
    val d = (1 to 10).map(i => (i.toLong, (i % 3).toLong)).toDF("event_id", "user_id")
    val got = Aggregate.leaderboard(d, "user_id", k = 2).as[(String, Long)].collect().toList
    // user 1 -> 4 events (1,4,7,10); users 0,2 -> 3 each; tie broken by key asc
    assert(got == List(("1", 4L), ("0", 3L)))
  }

  test("semanticContamination: planted matches surface with hit counts, sub-threshold pairs never") {
    // corpus: 1 and 2 parallel (cos 1), 3 orthogonal to both
    val corpus = vecs(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)))
    // probes: 10 hits 1 and 2 exactly; 11 hits only 3; 12 hits nothing
    val bench = vecs(
      (10L, Array(3f, 0f, 0f, 0f)),
      (11L, Array(0f, 5f, 0f, 0f)),
      (12L, Array(0f, 0f, 1f, 1f)))
    val got = Similarity.semanticContamination(corpus, bench, minCos = 0.6)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "probe 12 must flag nothing")
    assert(got(1L) == ((1L, 1.0)) && got(2L) == ((1L, 1.0)))
    assert(got(3L) == ((1L, 1.0)))
    // the threshold compares the ROUNDED cosine: 1/sqrt(2) -> 0.707
    val mid = vecs((20L, Array(1f, 1f, 0f, 0f)))
    val at07 = Similarity.semanticContamination(corpus, mid, minCos = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(at07 == Set(1L, 2L, 3L),
      "0.707 clears a 0.7 threshold (the probe is equidistant from e1 and e2)")
    val at071 = Similarity.semanticContamination(corpus, mid, minCos = 0.71)
      .collect()
    assert(at071.isEmpty, "0.707 stays below a 0.71 threshold")
  }
}
