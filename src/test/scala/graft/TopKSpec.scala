package graft

import graft.ops.{Relational, TopK}

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("TopK aggregator == window row_number form, including numeric tie-breaks") {
    // ties on cnt with user ids whose numeric and lexicographic order differ
    // (users 9 and 10): a string tie-break would pick the wrong one
    val events = (
      Seq.fill(5)((9L, "view")) ++ Seq.fill(5)((10L, "view")) ++
      Seq.fill(5)((2L, "view")) ++ Seq.fill(3)((1L, "view")) ++
      Seq.fill(4)((7L, "click")) ++ Seq.fill(4)((8L, "click"))
    ).zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val win = Relational.topUsersPerEventType(events, 3)
      .select("event_type", "user_id", "cnt", "rk")
      .as[(String, Long, Long, Int)].collect().toSet
    val agg = TopK.topUsersPerEventType(events, 3)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(agg == win)
    // ties 9 vs 10 at cnt=5: rank 1 must be user 2? no — cnt 5 for users 2,9,10
    val viewTop = agg.filter(_._1 == "view").toSeq.sortBy(_._4)
    assert(viewTop.map(_._2) == Seq(2L, 9L, 10L), s"numeric tie-break broken: $viewTop")
  }

  test("aggregator buffers stay bounded at k across partitionings") {
    val events = (1L to 1000L).map(i => (i, i % 97, "t")).toDF("event_id", "user_id", "event_type")
    val r1 = TopK.topUsersPerEventType(events.repartition(17), 5)
      .as[(String, Long, Long, Int)].collect().toSet
    val r2 = TopK.topUsersPerEventType(events.repartition(1), 5)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(r1 == r2, "result must be independent of physical partitioning")
    assert(r1.size == 5)
  }
}
