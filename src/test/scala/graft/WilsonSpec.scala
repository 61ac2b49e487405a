package graft

import org.apache.spark.sql.functions._
import graft.ops.Chat

class WilsonSpec extends SparkTestBase {
  import spark.implicits._

  test("winRateWilson: hand-computed bounds on known records") {
    // pair (1,2): a wins 9 of 10; pair (3,4): a wins 1 of 2
    val games =
      (Seq.fill(9)((1L, 2L)) ++ Seq.fill(1)((2L, 1L)) ++
        Seq((3L, 4L), (4L, 3L))).toDF("winner", "loser")
    val got = Chat.winRateWilson(games).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

    // (1,2): n=10, w=9, phat = 900000
    //   rad = (900000*100000)//10 + 1e12//100 = 9e9 + 1e10 = 1.9e10
    //   root = floor(sqrt(1.9e10)) = 137840
    //   lb = (10*900000 + 2000000 - 2*10*137840) // 14
    //      = (11000000 - 2756800) // 14 = 8243200 // 14 = 588800
    //   ub = (11000000 + 2756800) // 14 = 13756800 // 14 = 982628
    val p12 = got((1L, 2L))
    assert(p12.getLong(2) == 10L && p12.getLong(3) == 9L)
    assert(p12.getLong(4) == 900000L)
    assert(p12.getLong(5) == 588800L, s"lb ${p12.getLong(5)}")
    assert(p12.getLong(6) == 982628L, s"ub ${p12.getLong(6)}")
    assert(p12.getBoolean(7), "9/10 must be significant at z=2")
    assert(!p12.getBoolean(8))

    // (3,4): n=2, w=1, phat = 500000
    //   rad = (500000*500000)//2 + 1e12//4 = 125e9 + 250e9 = 375e9
    //   root = floor(sqrt(3.75e11)) = 612372
    //   lb = (2*500000 + 2000000 - 2*2*612372) // 6
    //      = (3000000 - 2449488) // 6 = 550512 // 6 = 91752
    //   ub = (3000000 + 2449488) // 6 = 5449488 // 6 = 908248
    val p34 = got((3L, 4L))
    assert(p34.getLong(5) == 91752L, s"lb ${p34.getLong(5)}")
    assert(p34.getLong(6) == 908248L, s"ub ${p34.getLong(6)}")
    assert(!p34.getBoolean(7) && !p34.getBoolean(8), "1/2 is never significant")
  }

  test("degenerate records: 0-of-n and n-of-n stay inside [0, 1e6]") {
    val games = (Seq.fill(5)((7L, 8L)) ++ Seq.fill(3)((10L, 9L)))
      .toDF("winner", "loser")
    val got = Chat.winRateWilson(games).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val sweep = got((7L, 8L)) // a wins 5/5
    assert(sweep.getLong(4) == 1000000L)
    assert(sweep.getLong(5) >= 0L && sweep.getLong(6) == 1000000L)
    val swept = got((9L, 10L)) // a wins 0/3
    assert(swept.getLong(4) == 0L)
    assert(swept.getLong(5) == 0L, "0-of-n lower bound clamps to 0")
    assert(swept.getLong(6) <= 1000000L && !swept.getBoolean(7))
    // n=3 is too little evidence even for 0-of-3: rad = 1e12//9 ->
    // root 333333, ub = (2e6 + 6*333333)//7 = 571428 > 1/2 -> NOT
    // significant; b_better only fires with more games
    assert(!swept.getBoolean(8))
  }

  test("wilson bounds tighten with n at the same rate") {
    val small = Chat.winRateWilson(
      (Seq.fill(3)((1L, 2L)) ++ Seq.fill(1)((2L, 1L))).toDF("winner", "loser"))
      .head()
    val large = Chat.winRateWilson(
      (Seq.fill(300)((1L, 2L)) ++ Seq.fill(100)((2L, 1L))).toDF("winner", "loser"))
      .head()
    assert(small.getLong(4) == large.getLong(4), "same phat")
    assert(large.getLong(5) > small.getLong(5) &&
      large.getLong(6) < small.getLong(6), "100x games must tighten bounds")
    assert(large.getBoolean(7), "3:1 at n=400 is significant at z=2")
  }
}
