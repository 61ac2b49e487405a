package graft

import org.apache.spark.sql.functions._
import graft.ops.Gk

/** Greenwald-Khanna keyed quantile summary: exact behavior below the
  * compression regime, rank-error bounds under adversarial orders and
  * merge trees, bounded summary size, group independence (grouped ==
  * solo per group), and the certified query end-to-end.
  */
class GkSpec extends SparkTestBase {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Long =
    sorted.count(_ <= v).toLong // rank of v = how many values <= it

  test("small-n regime: summary answers exact order statistics") {
    val s = new Gk.Summary(0.005)
    // n=80 < 1/(2 eps)=100: allow=0, nothing ever compresses
    val vals = (1 to 80).map(_.toDouble).reverse
    vals.foreach(s.insert)
    assert(s.query(0.5) == 40.0) // ceil(0.5*80)=40
    assert(s.query(0.0) == 1.0 && s.query(1.0) == 80.0)
    assert(s.query(0.25) == 20.0 && s.query(0.75) == 60.0)
  }

  test("empty summary: NaN for every p") {
    val s = new Gk.Summary(0.01)
    assert(s.query(0.5).isNaN && s.query(0.0).isNaN)
  }

  test("rank bounds hold under adversarial orders and merge trees; size stays bounded") {
    val eps = 0.01
    val n = 50000
    // skewed, duplicate-heavy values (Zipf-ish integer squares mod m)
    val vals = Array.tabulate(n)(i => ((i.toLong * i) % 997L).toDouble)
    val sorted = vals.sorted
    val orders = Seq(
      vals, // natural
      vals.sorted, // ascending (worst case for naive summaries)
      vals.sorted.reverse, // descending
      vals.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L) % n }
        .map(_._1) // hash-shuffled
    )
    for (ord <- orders) {
      // a lopsided merge tree: 5 chunks of very different sizes reduced
      // separately then folded left — the shape a skewed shuffle produces
      val cuts = Seq(0, 7, 1000, 1100, 30000, n)
      val parts = cuts.sliding(2).map { case Seq(a, b) =>
        val s = new Gk.Summary(eps)
        (a until b).foreach(i => s.insert(ord(i)))
        s
      }.toList
      val merged = parts.reduceLeft((a, b) => a.mergeWith(b))
      for (p <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
        val got = merged.query(p)
        val r = math.max(1L, math.ceil(p * n).toLong)
        // rank window of the returned value: [count(< got)+1, count(<= got)]
        val rLo = sorted.count(_ < got).toLong + 1
        val rHi = rankOf(sorted, got)
        val slack = (eps * n).toLong + 1 // +1: flush-batch gap
        assert(rLo - slack <= r && r <= rHi + slack,
          s"p=$p: got $got rank [$rLo,$rHi], want $r +/- $slack")
      }
      // boundedness: ~(1/eps) log(eps n) tuples, not O(n)
      merged.flush()
      assert(merged.size < 2500, s"summary grew to ${merged.size}")
    }
  }

  test("group independence: grouped == solo per group (fixed partitioning)") {
    // interleave three groups in ONE partition so grouped and solo runs
    // see identical per-group insert orders; any cross-group
    // contamination of a summary would diverge the answers
    val rows = (0 until 3000).map { i =>
      (Seq("a", "b", "c")(i % 3), ((i.toLong * 131) % 509L).toDouble)
    }
    val df = rows.toDF("g", "x").coalesce(1)
    val ps = Seq(0.25, 0.5, 0.9)
    val grouped = Gk.groupedQuantiles(df, "g", "x", ps, eps = 0.01)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("a", "b", "c")) {
      val solo = Gk.groupedQuantiles(
        df.where(col("g") === g), "g", "x", ps, eps = 0.01)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      for (p <- ps)
        assert(grouped((g, p)) == solo((g, p)),
          s"group $g p=$p: grouped ${grouped((g, p))} != solo ${solo((g, p))}")
    }
  }

  test("groupedQuantilesCertified: every certificate TRUE; NULLs excluded") {
    val rows = (0 until 5000).map { i =>
      (if (i % 17 == 0) null else Seq("s1", "s2")(i % 2),
        if (i % 19 == 0) null else java.lang.Double.valueOf((i % 701).toDouble))
    }
    val df = rows.toDF("src", "x")
    val out = Gk.groupedQuantilesCertified(df, "src", "x",
      ps = Seq(0.25, 0.5, 0.75, 0.95), eps = 0.005).collect()
    assert(out.length == 8) // 2 groups x 4 ps; NULL group excluded
    assert(out.forall(_.getBoolean(3)), "a rank certificate failed")
    // exact column replays DuckDB's quantile_cont (R-7): spot-check p=0.5
    // of s1: values are (i % 701) for even i not divisible by 17/19
    val s1 = rows.filter(r => r._1 == "s1" && r._2 != null).map(_._2.doubleValue).sorted
    val h = 0.5 * (s1.length - 1)
    val exp = math.floor((s1(h.toInt) + (h - h.toInt) *
      (s1(math.ceil(h).toInt) - s1(h.toInt))) * 100 + 0.5) / 100.0
    val got = out.find(r => r.getString(0) == "s1" && r.getDouble(1) == 0.5).get.getDouble(2)
    assert(got == exp)
  }

  test("groupedQuantilesCertifiedByRank: TRUE for arbitrarily small windows") {
    // per-window groups of 3..80 rows — the regime where the
    // interpolated p±2eps value window can sit strictly between
    // adjacent order statistics; the rank-counted certificate must
    // hold for every (n, p) combination
    val rows = (0 until 2000).flatMap { i =>
      val g = s"w${i % 37}" // 37 windows, ~54 rows each
      Seq((g, (i * 193 % 997).toDouble))
    } ++ (0 until 3).map(i => ("tiny", i.toDouble)) // a 3-row window
    val out = Gk.groupedQuantilesCertifiedByRank(
      rows.toDF("src_day", "x"), "src_day", "x").collect()
    assert(out.length == 38 * 4)
    assert(out.forall(_.getBoolean(4)), "a rank certificate failed: " +
      out.filterNot(_.getBoolean(4)).mkString(", "))
    // duplicate-heavy window: rank interval is wide, still certified
    val dup = (0 until 50).map(_ => ("d", 7.0)) ++ Seq(("d", 1.0), ("d", 9.0))
    val out2 = Gk.groupedQuantilesCertifiedByRank(
      dup.toDF("src_day", "x"), "src_day", "x").collect()
    assert(out2.forall(_.getBoolean(4)))
  }
}
