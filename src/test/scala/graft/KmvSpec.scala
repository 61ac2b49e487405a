package graft

import graft.ops.Kmv
import org.apache.spark.sql.functions._

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("hash48: first 12 md5 hex chars as integer (pinned)") {
    // md5("1") = c4ca4238a0b9... -> 0xc4ca4238a0b9
    val got = Seq("1").toDF("x").select(Kmv.hash48(col("x"))).as[Long].head()
    assert(got == java.lang.Long.parseLong("c4ca4238a0b9", 16))
  }

  test("under-k input: sketch IS the distinct hash set, estimate exact") {
    val df = (1L to 40L).map(i => i % 10).toDF("x") // 10 distinct, heavy dups
    val sk = Kmv.sketch(df, "x", k = 64)
    assert(sk.count() == 10)
    val est = Kmv.estimate(sk, k = 64).head()
    assert(est.getLong(0) == 10L)              // n_kept
    assert(est.getLong(2) == 10L)              // est_distinct == exact path
  }

  test("estimator path: formula pinned, estimate within 25% at k=64/n=5000") {
    val df = (1L to 5000L).toDF("x")
    val sk = Kmv.sketch(df, "x", k = 64)
    assert(sk.count() == 64)
    val kth = sk.agg(max("v")).as[Long].head()
    val est = Kmv.estimate(sk, k = 64).head()
    assert(est.getLong(1) == kth)
    assert(est.getLong(2) == (63L * Kmv.HashSpace) / (kth + 1L))
    val e = est.getLong(2).toDouble
    assert(math.abs(e - 5000.0) / 5000.0 < 0.25, s"estimate $e too far from 5000")
  }

  test("mergeability: trim(kmv(A) u kmv(B)) == kmv(A u B), overlap included") {
    val a = (1L to 800L).toDF("x")
    val b = (500L to 1300L).toDF("x") // overlaps A on [500,800]
    val k = 32
    val merged = Kmv.mergeSketches(
      Kmv.sketch(a, "x", k), Kmv.sketch(b, "x", k), k)
      .as[Long].collect().sorted.toSeq
    val direct = Kmv.sketch(a.union(b), "x", k)
      .as[Long].collect().sorted.toSeq
    assert(merged == direct)
  }

  test("grouped: per-group sketches independent; under-k groups exact") {
    // group a: 200 distinct (estimator path at k=16); b: 5 distinct (exact)
    val df = ((1L to 200L).map(i => ("a", i)) ++
      (1L to 50L).map(i => ("b", i % 5))).toDF("g", "x")
    val got = Kmv.groupedCertifiedEstimate(df, "g", "x", k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val (aKept, aEst, aExact) = got("a")
    assert(aKept == 16L && aExact == 200L)
    // accuracy is the ungrouped k=64 test's job; k=16 on this small set
    // draws a deterministic ~1.8x estimate — only sanity-bound it here
    assert(aEst > 50L && aEst < 800L)
    assert(got("b") == ((5L, 5L, 5L)))
    // group a's estimate must equal the ungrouped sketch of a alone
    val solo = Kmv.certifiedEstimate(
      df.where($"g" === "a").select($"x"), "x", k = 16).head().getLong(2)
    assert(aEst == solo)
  }

  test("setEstimates: under-full sketches degenerate to exact set ops") {
    val a = (1L to 30L).toDF("x")
    val b = (21L to 50L).toDF("x") // overlap 10, union 50
    val r = Kmv.setEstimates(a, "x", b, "x", k = 64).head()
    assert(r.getLong(0) == 30L && r.getLong(1) == 30L)  // n_a, n_b
    assert(r.getLong(2) == Kmv.HashSpace)               // theta = kept-all
    assert(r.getLong(3) == 10L)                         // est_inter exact
    assert(r.getLong(4) == 50L)                         // est_union exact
    assert(r.getLong(5) == 50L && r.getLong(6) == 10L)  // exact counterparts
  }

  test("setEstimates: full sketches estimate within 30% at k=128/n=4000") {
    val a = (1L to 3000L).toDF("x")
    val b = (2001L to 5000L).toDF("x") // inter 1000, union 5000
    val r = Kmv.setEstimates(a, "x", b, "x", k = 128).head()
    assert(r.getLong(0) == 128L && r.getLong(1) == 128L)
    assert(r.getLong(2) < Kmv.HashSpace) // a real threshold
    val inter = r.getLong(3).toDouble
    val union = r.getLong(4).toDouble
    // intersection sees only ~k·|inter|/|union| ≈ 26 hashes below θ, so
    // its σ is ~20% (vs ~9% for the union's full k) — bound at ~2.5σ;
    // the draw is deterministic (this exact data yields 1395)
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.5, s"inter $inter")
    assert(math.abs(union - 5000.0) / 5000.0 < 0.25, s"union $union")
    assert(r.getLong(5) == 5000L && r.getLong(6) == 1000L)
  }

  test("multiIntersection: 3-way exact degenerate and agreement with setEstimates") {
    val a = (1L to 40L).toDF("x")
    val b = (21L to 60L).toDF("x")
    val c = (31L to 70L).toDF("x") // a∩b∩c = [31,40] -> 10
    val r = Kmv.multiIntersection(
      Seq((a, "x"), (b, "x"), (c, "x")), k = 64).head()
    assert(r.getLong(0) == 40L && r.getLong(1) == 40L && r.getLong(2) == 40L)
    assert(r.getLong(3) == Kmv.HashSpace) // all under-full: θ = kept-all
    assert(r.getLong(4) == 10L)           // n_common == exact candidates
    assert(r.getLong(5) == 10L)           // est_inter exact
    assert(r.getLong(6) == 10L)           // exact_inter
    // two-input multiIntersection must agree with setEstimates' est_inter
    val two = Kmv.multiIntersection(Seq((a, "x"), (b, "x")), k = 16).head()
    val se = Kmv.setEstimates(a, "x", b, "x", k = 16).head()
    assert(two.getLong(two.length - 2) == se.getLong(3)) // est_inter
  }

  test("null values excluded; certifiedEstimate carries the exact count") {
    val df = Seq(Some(1L), Some(2L), Some(2L), None).toDF("x")
    val got = Kmv.certifiedEstimate(df, "x", k = 8).head()
    assert(got.getLong(0) == 2L)   // n_kept
    assert(got.getLong(2) == 2L)   // est (exact path)
    assert(got.getLong(3) == 2L)   // exact_distinct
  }
}
