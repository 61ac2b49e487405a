package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.GraphAnn

class GraphAnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("persisted graph index: routed search finds the planted source top-1") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 5,
      refineRounds = 1)
    // 2x scaled copies share the b0 bucket and cosine 1.0 with their
    // source (the q28 contract), so entry routing must surface it
    val probes = emb.where(col("vec_id") < 4).select(
      (col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val top1 = GraphAnn.searchGraphIndex(spark, path, probes, k = 3,
        beam = 8, hops = 1)
      .where(col("rank") === 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(top1 == Map(1000L -> 0L, 1001L -> 1L, 1002L -> 2L, 1003L -> 3L),
      s"routed persisted search failed: $top1")
    // entry routing selects by the b0 partition column -> the vectors
    // scan must carry a dynamic pruning filter
    val plan = GraphAnn.searchGraphIndex(spark, path, probes, k = 3,
      beam = 8, hops = 0).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on b0:\n${plan.take(3000)}")
  }

  test("appendToGraphIndex: batch searchable, back-edges reach new nodes, only touched b0 dirs gain files") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 5,
      refineRounds = 0)
    val before = new java.io.File(s"$path/vectors").listFiles()
      .filter(_.getName.startsWith("b0=")).map(f =>
        f.getName -> f.listFiles().length).toMap
    // batch: exact twins of sources 0..2 at +1000 (same b0 as source)
    val batch = emb.where(col("vec_id") < 3).select(
      (col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    GraphAnn.appendToGraphIndex(spark, path, batch)
    val after = new java.io.File(s"$path/vectors").listFiles()
      .filter(_.getName.startsWith("b0=")).map(f =>
        f.getName -> f.listFiles().length).toMap
    val touched = after.filter { case (d, n) => before.getOrElse(d, 0) < n }
    assert(touched.nonEmpty && touched.size <= 3,
      s"appends must touch only the batch's bucket dirs: $touched")
    assert(before.forall { case (d, n) =>
      touched.contains(d) || after(d) == n },
      "untouched bucket dirs must keep their file count")
    // routed search for a 2x probe of an APPENDED twin must return it:
    // probe 4*v shares b0 with twin 2*v and source v; cos ties at 1.0
    // resolve to the SOURCE (lower id) — so assert the twin is in the
    // top-2 (source rank 1, twin rank 2), proving the appended node is
    // indexed and scored
    val probes = emb.where(col("vec_id") < 3).select(
      (col("vec_id") + 2000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    val top2 = GraphAnn.searchGraphIndex(spark, path, probes, k = 2,
        beam = 8, hops = 1)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toList }
    assert(top2 == Map(
      2000L -> List(0L, 1000L), 2001L -> List(1L, 1001L),
      2002L -> List(2L, 1002L)), s"append search failed: $top2")
    // back-edge certificate: entry PINNED at the original source; the
    // appended twin is reachable only through the source's back-edge
    // (source -> twin appended by the batch), so rank 2 = twin proves
    // the back-edge leg wrote and the walk crosses it
    val entries = probes.select(col("vec_id").as("qid"),
      (col("vec_id") - 2000L).as("nid"))
    val corpus = spark.read.parquet(s"$path/vectors")
      .select(col("nid").as("vec_id"), col("nvec").as("embedding"))
    val edges = spark.read.parquet(s"$path/edges")
    val viaHop = GraphAnn.beamSearch(probes, corpus, edges, Some(entries),
        k = 2, beam = 8, hops = 1)
      .where(col("rank") === 2)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(viaHop == Map(2000L -> 1000L, 2001L -> 1001L, 2002L -> 1002L),
      s"back-edge traversal failed: $viaHop")
  }

  test("meta round-trip: search uses stored planes, not caller defaults") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    // planes=9 differs from every GraphAnn default; if search re-derived
    // buckets with a different planes value, probe and source would land
    // in different buckets and the routed certificate would fail
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 9,
      refineRounds = 0)
    val probes = emb.where(col("vec_id") < 2).select(
      (col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val top1 = GraphAnn.searchGraphIndex(spark, path, probes, k = 1,
        beam = 4, hops = 0)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(top1 == Map(1000L -> 0L, 1001L -> 1L), s"meta planes ignored: $top1")
  }
}
