package graft

import graft.ops.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("uniqueness: duplicates beyond the first counted; clean table -> 0") {
    val dup = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    assert(Quality.uniquenessViolations(dup, Seq("k")).as[Long].head() == 2L)
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Quality.uniquenessViolations(clean, Seq("k")).as[Long].head() == 0L)
    // empty input -> 0, not null (the COALESCE matters)
    assert(Quality.uniquenessViolations(clean.where($"k" < 0), Seq("k")).as[Long].head() == 0L)
  }

  test("fk: orphans counted, NULL child keys pass (SQL FK semantics)") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(3L), Some(4L), None).toDF("fk")
    assert(Quality.fkViolations(child, "fk", parent, "pk").as[Long].head() == 2L)
  }

  test("domain: out-of-set counted, NULL passes") {
    val df = Seq(Some("a"), Some("b"), Some("x"), None).toDF("c")
    assert(Quality.domainViolations(df, "c", Seq("a", "b")).as[Long].head() == 1L)
    assert(Quality.nullViolations(df, "c").as[Long].head() == 1L)
  }

  test("snapshotDiff: added/removed/changed, unchanged rows absent") {
    val before = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)).toDF("k", "t", "v")
    val after = Seq((2L, "y", 2.0), (3L, "z", 9.0), (4L, "w", 4.0)).toDF("k", "t", "v")
    val got = Quality.snapshotDiff(before, after, "k", Seq("t", "v"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }
}
