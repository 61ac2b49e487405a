package graft

import graft.ops.Importance

/** Waterfilling token-budget allocation (q210): hand-traced levels,
  * remainder bumps, saturation, and the exact-budget invariant. */
class WaterfillSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(source: String, ntok: Int): (String, String) =
    source -> Seq.fill(ntok)("t").mkString(" ")

  private def run(docs: Seq[(String, String)], ppm: Long = 500000L) =
    Importance.waterfillAllocation(
      docs.toDF("source", "text"), budgetPpm = ppm).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap

  test("small sources saturate, the big one takes the leftover level") {
    // avail 10/100/1000, budget = 555: sat {10, 100}, level = 445
    val got = run(Seq(doc("s", 10), doc("m", 100), doc("b", 1000)))
    assert(got("s") == ((10L, 10L, true, 1000000L)))
    assert(got("m") == ((100L, 100L, true, 1000000L)))
    assert(got("b") == ((1000L, 445L, false, 445000L)))
  }

  test("mod remainder bumps the first unsaturated sources, total exact") {
    // avail 7/7/7/9, budget 15: nobody saturates, level 3 r 3 ->
    // a,b,c get 4, d gets 3
    val got = run(Seq(doc("a", 7), doc("b", 7), doc("c", 7), doc("d", 9)))
    assert(got("a")._2 == 4L && got("b")._2 == 4L && got("c")._2 == 4L)
    assert(got("d")._2 == 3L)
    assert(got.values.map(_._2).sum == 15L)
  }

  test("full budget: every source saturates at its availability") {
    val got = run(Seq(doc("a", 5), doc("b", 50)), ppm = 1000000L)
    assert(got("a") == ((5L, 5L, true, 1000000L)))
    assert(got("b") == ((50L, 50L, true, 1000000L)))
  }

  test("invariant: allocations sum exactly to the budget") {
    val fixture = (0 until 17).map(i => doc(s"src$i", 3 + (i * 37) % 101))
    for (ppm <- Seq(100000L, 333333L, 500000L, 900000L)) {
      val got = run(fixture, ppm)
      val total = got.values.map(_._1).sum
      assert(got.values.map(_._2).sum == total * ppm / 1000000L,
        s"ppm=$ppm must allocate the exact integer budget")
    }
  }

  test("empty sources are excluded, not zero-divided") {
    val got = run(Seq(doc("a", 4), "empty" -> "", "ws" -> "   "))
    assert(got.keySet == Set("a"))
  }
}
