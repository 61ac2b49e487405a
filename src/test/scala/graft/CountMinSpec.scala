package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  // skewed stream: key k appears (k+1)*10 times for k in 0..9, plus 1000
  // distinct singletons as collision fodder
  private def skewed = {
    val heavy = spark.range(0, 10).select(col("id").as("k"))
      .crossJoin(spark.range(0, 100).select((col("id") + 1).as("m")))
      .where(col("m") <= (col("k") + 1) * 10)
      .select(col("k"))
    val tail = spark.range(1000, 2000).select(col("id").as("k"))
    heavy.union(tail)
  }

  test("estimates are partition-invariant and respect the CMS bounds") {
    val df = skewed
    val s1 = CountMin.sketch(df, "k")
    val s2 = CountMin.sketch(df.repartition(17), "k")
    val exact = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    val n = s1.totalCount()
    assert(n == df.count() && s2.totalCount() == n)
    exact.foreach { case (k, cnt) =>
      val e1 = s1.estimateCount(k)
      // deterministic under repartitioning: counters are sums
      assert(e1 == s2.estimateCount(k), s"estimate for $k differs across partitionings")
      assert(e1 >= cnt, s"CMS must never under-count: key $k est $e1 < $cnt")
    }
    // the eps*N bound is probabilistic PER KEY (>= confidence); assert it
    // on the heavy keys only — over all 1010 keys a handful of misses
    // would be within spec
    (0L to 9L).foreach { k =>
      assert(s1.estimateCount(k) <= exact(k) + 1e-3 * n,
        s"heavy key $k exceeds eps*N bound")
    }
  }

  test("explicit mergeInPlace equals the sketch of the union") {
    val df = skewed
    val a = CountMin.sketch(df.where($"k" % 2 === 0), "k")
    val b = CountMin.sketch(df.where($"k" % 2 =!= 0), "k")
    val whole = CountMin.sketch(df, "k")
    a.mergeInPlace(b)
    for (k <- Seq(0L, 5L, 9L, 1500L))
      assert(a.estimateCount(k) == whole.estimateCount(k),
        s"merged estimate for $k must equal whole-stream estimate")
  }

  test("certifiedCounts: exact top-k with all-green bounds") {
    val got = CountMin.certifiedCounts(skewed, "k", k = 5)
      .as[(Long, Long, Boolean, Boolean)].collect()
    // top-5 heavy keys by construction: k=9 (100), 8 (90), ... 5 (60)
    assert(got.map(_._1).toSeq == Seq(9L, 8L, 7L, 6L, 5L))
    assert(got.map(_._2).toSeq == Seq(100L, 90L, 80L, 70L, 60L))
    assert(got.forall(r => r._3 && r._4), got.mkString(","))
  }
}
