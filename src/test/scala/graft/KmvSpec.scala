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

  test("KmvBuffer: kept set == k smallest distinct under adversarial orders") {
    // reference: sorted distinct prefix
    def ref(vals: Seq[Long], k: Int): Seq[Long] = vals.distinct.sorted.take(k)
    val rnd = Array.tabulate(5000)(i => (i.toLong * 2654435761L) % 100003L)
    val cases = Seq(
      ("ascending", rnd.sorted.toSeq),
      ("descending churn", rnd.sorted.reverse.toSeq), // every insert replaces max
      ("hash order", rnd.toSeq),
      ("heavy dups", rnd.map(_ % 50L).toSeq))
    for ((name, vals) <- cases; k <- Seq(1, 16, 128)) {
      val b = new Kmv.KmvBuffer(k)
      vals.foreach(b.insert)
      assert(b.toSortedArray.toSeq == ref(vals, k), s"$name k=$k")
    }
  }

  test("KmvBuffer: absorb == direct; lopsided merge sides; tombstone rebuild") {
    val x = Array.tabulate(3000)(i => (i.toLong * 131071L) % 999983L)
    val (l, r) = x.splitAt(7) // lopsided: 7 vs 2993
    val k = 64
    val direct = new Kmv.KmvBuffer(k)
    x.foreach(direct.insert)
    val a = new Kmv.KmvBuffer(k)
    l.foreach(a.insert)
    val b = new Kmv.KmvBuffer(k)
    r.foreach(b.insert)
    a.absorb(b)
    assert(a.toSortedArray.toSeq == direct.toSortedArray.toSeq)
    // descending stream >> table capacity forces many tombstone rebuilds;
    // the kept set must still be exact
    val churn = new Kmv.KmvBuffer(8)
    (100000L to 1L by -1L).foreach(churn.insert)
    assert(churn.toSortedArray.toSeq == (1L to 8L).toSeq)
  }

  test("sourceOverlapSketch: under-full degenerates to exact; matrix complete") {
    // three sources; a/b share exactly the shingle "x y" region, c is
    // disjoint — with k far above shingle counts every sketch keeps all
    // hashes, theta = 2^48, and est == exact for every pair
    val docs = Seq(
      (1L, "a", "x y z w"), (2L, "a", "p q r"),
      (3L, "b", "x y k l"), (4L, "b", "m n"),
      (5L, "c", "unrelated words entirely here")
    ).toDF("doc_id", "source", "text")
    val got = Kmv.sourceOverlapSketch(docs, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(5), r.getLong(6), r.getLong(9)))).toMap
    assert(got.size == 3, "matrix must cover every pair incl. zero overlap")
    // a: {x y, y z, z w, p q, q r}; b: {x y, y k, k l, m n}; shared {x y}
    val (nc, est, exact) = got(("a", "b"))
    assert(nc == 1L && est == 1L && exact == 1L)
    assert(got(("a", "c")) == ((0L, 0L, 0L)))
    assert(got(("b", "c")) == ((0L, 0L, 0L)))
  }

  test("sourceOverlapSketch: full sketches estimate overlap within ~3/sqrt(k)") {
    // two sources over a large shared vocabulary: source a = tokens of
    // ids 0..1499, b = 1000..2499 as single-token docs (1-shingle via
    // the short-doc fallback) -> exact overlap 500, each side 1500
    val docs = ((0 until 1500).map(i => (i.toLong, "a", s"tok$i")) ++
      (1000 until 2500).map(i => (10000L + i, "b", s"tok$i")))
      .toDF("doc_id", "source", "text")
    val r = Kmv.sourceOverlapSketch(docs, k = 256).head()
    assert(r.getLong(2) == 256L && r.getLong(3) == 256L) // both full
    assert(r.getLong(7) == 1500L && r.getLong(8) == 1500L)
    assert(r.getLong(9) == 500L)
    val est = r.getLong(6).toDouble
    assert(math.abs(est - 500.0) / 500.0 < 0.4, s"est_inter $est vs 500")
  }

  test("null values excluded; certifiedEstimate carries the exact count") {
    val df = Seq(Some(1L), Some(2L), Some(2L), None).toDF("x")
    val got = Kmv.certifiedEstimate(df, "x", k = 8).head()
    assert(got.getLong(0) == 2L)   // n_kept
    assert(got.getLong(2) == 2L)   // est (exact path)
    assert(got.getLong(3) == 2L)   // exact_distinct
  }
}
