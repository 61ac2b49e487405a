package graft

import graft.ops.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankFixed: hand-computed micro-ranks on a 3-node DAG") {
    // a->b, a->c, b->c; c dangling
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    // iter1: b <- 1e6 DIV 2; c <- 500000 + 1e6
    //   a=150000, b=150000+425000=575000, c=150000+1275000=1425000
    // iter2: contribs a:75000 to b and c, b: 575000 to c
    //   a=150000, b=213750, c=150000+(85*650000) DIV 100=702500
    val got = Graph.pageRankFixed(edges, iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 150000L, "b" -> 213750L, "c" -> 702500L), got.toString)
  }

  test("pageRankFixed: cycle reaches the exact fixed point; partitioning-invariant") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankFixed(cyc, iters = 5).as[(Long, Long)].collect().toMap
    // symmetric 2-cycle: 150000 + 850000 = 1000000 every round
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
    // bigger graph with a genuine hub (half of all edges point at node 0
    // — a uniform (id*7)%101 target would make the graph regular and
    // every rank exactly 1e6): identical ranks under repartitioning
    val e = spark.range(0, 2000).selectExpr("id % 101 src",
      "CASE WHEN id % 2 = 0 THEN 0 ELSE (id * 7) % 101 END dst")
    val a = Graph.pageRankFixed(e, 3).as[(Long, Long)].collect().toMap
    val b = Graph.pageRankFixed(e.repartition(13), 3).as[(Long, Long)].collect().toMap
    assert(a == b, "integer arithmetic must be partitioning-invariant")
    // hubs outrank leaves: dst 0 receives many edges
    assert(a.values.max > 1000000L)
  }
}
