package graft

import graft.ops.{Dedup, Pipeline}
import org.apache.spark.sql.functions._

/** Composition semantics of the FineWeb-style pipeline: each stage
  * filters the previous stage's survivors (the q131 oracle pins the
  * exact values; this spec pins the structural claims a user relies
  * on).
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")

  test("survivors are a subset of the corpus and respect the source cap") {
    val out = Pipeline.fineWebCurate(docs).persist()
    val n = out.count()
    assert(n > 0)
    val ids = out.select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(all))
    val perSource = out.groupBy("source").count()
      .select("count").as[Long].collect()
    assert(perSource.forall(_ <= 12))
    // no tail-tier docs survive
    assert(out.where(col("ppl_bucket") === "tail").count() == 0)
    out.unpersist()
  }

  test("repetition gate actually rejects a planted degenerate doc") {
    val planted = docs.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .union(Seq((99999L, "en", "src0", Seq.fill(60)("spam").mkString(" ")))
        .toDF("doc_id", "lang", "source", "text"))
    val out = Pipeline.fineWebCurate(planted)
    assert(out.where(col("doc_id") === 99999L).count() == 0)
  }

  test("span dedup stage feeds CLEANED text downstream (n_removed surfaces)") {
    val out = Pipeline.fineWebCurate(docs)
    // sf0.001 has real duplicated 5-gram spans (57 docs) — at least one
    // survivor should carry a nonzero n_removed
    assert(out.where(col("n_removed") > 0).count() > 0)
  }

  test("deterministic: two runs produce identical rows") {
    val a = Pipeline.fineWebCurate(docs).collect().map(_.toString).sorted
    val b = Pipeline.fineWebCurate(docs).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("exactSubstrDedup keep-columns passthrough preserves values") {
    val out = Dedup.exactSubstrDedup(docs, minLen = 5, keep = Seq("lang", "source"))
    val orig = docs.select("doc_id", "lang", "source")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = out.select("doc_id", "lang", "source")
      .as[(Long, String, String)].collect()
    assert(got.length == orig.size)
    got.foreach { case (id, l, s) => assert(orig(id) == ((l, s))) }
  }

  test("governanceSweep: precedence pinned gate by gate, totality holds") {
    val reg = Seq("banned.example.com").toDF("domain")
    val readable = "the cat sat here. it ran off! we saw it go."
    val rows = Seq(
      // trips EVERY gate: opt-out must win
      (1L, "http://banned.example.com/a",
        s"SPDX-License-Identifier: GPL-3.0-only u1@example.com $readable"),
      // copyleft + pii + readable: license outranks pii
      (2L, "http://ok.example.com/b",
        s"SPDX-License-Identifier: GPL-3.0-only u2@example.com $readable"),
      // pii only
      (3L, "http://ok.example.com/c", s"mail u3@example.com $readable"),
      // unreadable only (no sentences, vowel-dense words)
      (4L, "http://ok.example.com/d", "banana bandana banana bandana"),
      // clean keep
      (5L, "http://ok.example.com/e", readable),
      // unparseable host still gets a verdict row (totality)
      (6L, "not a url", readable))
      .toDF("doc_id", "url", "text")
    val got = Pipeline.governanceSweep(rows, reg).collect()
      .map(r => r.getLong(0) -> ((r.getString(7), r.getBoolean(8)))).toMap
    assert(got == Map(
      1L -> (("opted_out", false)), 2L -> (("license", false)),
      3L -> (("pii", false)), 4L -> (("unreadable", false)),
      5L -> (("keep", true)), 6L -> (("keep", true))),
      s"precedence or totality broke: $got")
  }

  test("governanceSweep: NULL-url docs keep their verdict row (totality)") {
    val reg = Seq("banned.example.com").toDF("domain")
    val rows = Seq(
      (1L, null.asInstanceOf[String], "the cat sat here. it ran off!"),
      (2L, "http://ok.example.com/a", "the cat sat here. it ran off!"))
      .toDF("doc_id", "url", "text")
    val got = Pipeline.governanceSweep(rows, reg).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(got.keySet == Set(1L, 2L),
      s"a NULL url must not drop the doc from the sweep: $got")
    assert(got(1L) == "keep", "no host evidence cannot mean opted_out")
  }
}
