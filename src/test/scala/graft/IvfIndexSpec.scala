package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Similarity

class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("persisted IVF index: search equals in-memory IVF; DPP prunes list partitions") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-ivf").toString

    Similarity.buildIvfIndex(emb, path, nlist = 8)
    val probes = emb.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))

    val indexed = Similarity.searchIvfIndex(spark, path, probes, k = 5, nprobe = 3)
    val centroids = Similarity.fitCentroids(emb, nlist = 8) // same seed -> same model
    val direct = Similarity.ivfKnn(probes, emb, centroids, k = 5, nprobe = 3)
    val a = indexed.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val b = direct.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b, s"indexed vs direct diverged: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    assert(a.nonEmpty)

    // the point of partitioning by list_id: the scan carries a dynamic
    // pruning filter on the partition column, so only probed inverted
    // lists are read from disk
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on list_id:\n${plan.take(3000)}")
  }

  test("appendToIvfIndex: new vectors searchable, only touched partitions gain files") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-ivf3").toString
    Similarity.buildIvfIndex(emb, path, nlist = 8)
    val filesBefore = Files.walk(java.nio.file.Paths.get(s"$path/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()

    // append exact copies of corpus vectors 3 and 11 under new ids — each
    // lands in exactly the list its twin occupies
    val batch = emb.where(col("vec_id").isin(3L, 11L))
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfIndex(spark, path, batch)

    // the appended vectors are immediately searchable: probing with the
    // originals must now return the appended twins as top-1 (cos = 1)
    val probes = emb.where(col("vec_id").isin(3L, 11L))
    val got = Similarity.searchIvfIndex(spark, path, probes, k = 1, nprobe = 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 5000003L, 11L -> 5000011L), s"got $got")

    // append wrote files only into the touched list partitions (<= 2
    // lists x 1 file each), never rewriting the existing index
    val filesAfter = Files.walk(java.nio.file.Paths.get(s"$path/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(filesAfter > filesBefore && filesAfter <= filesBefore + 2,
      s"before=$filesBefore after=$filesAfter")
  }

  test("replayed append: duplicated neighbour holds ONE top-k rank, not two") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-ivf4").toString
    Similarity.buildIvfIndex(emb, path, nlist = 8)
    // the same ingest batch lands TWICE — the crash-replay shape; the
    // twin of vector 3 is then duplicated in its frozen list, and
    // pre-fix it occupied ranks 1 AND 2, evicting the true second
    // neighbour (the source itself at cos 1.0)
    val batch = emb.where(col("vec_id") === 3L)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfIndex(spark, path, batch)
    Similarity.appendToIvfIndex(spark, path, batch)
    val probes = emb.where(col("vec_id") === 3L)
      .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
    val top2 = Similarity.searchIvfIndex(spark, path, probes, k = 2, nprobe = 1)
      .orderBy(col("rank")).select("nid").as[Long].collect().toList
    assert(top2 == List(3L, 5000003L),
      s"replayed twin must hold one rank (ties break nid asc): $top2")
  }

  test("compactIvfIndex: search-invariant, lists fold to one row per (list_id, nid), files bounded") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-ivf5").toString
    Similarity.buildIvfIndex(emb, path, nlist = 8)
    val batch = emb.where(col("vec_id").isin(3L, 11L))
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
    // three identical appends = two crash replays: duplicated rows and
    // three file waves in the touched lists
    Similarity.appendToIvfIndex(spark, path, batch)
    Similarity.appendToIvfIndex(spark, path, batch)
    Similarity.appendToIvfIndex(spark, path, batch)
    val probes = emb.where(col("vec_id").isin(3L, 11L))
      .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
    def results() = Similarity.searchIvfIndex(spark, path, probes,
        k = 3, nprobe = 2)
      .select("qid", "nid", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    def listFiles() = Files.walk(java.nio.file.Paths.get(s"$path/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = results()
    val filesBefore = listFiles()
    Similarity.compactIvfIndex(spark, path)
    assert(results() == before, "compaction must not change what search sees")
    val perKey = spark.read.parquet(s"$path/lists")
      .groupBy("list_id", "nid").count().agg(max("count")).as[Long].head()
    assert(perKey == 1, s"lists must fold to one row per (list_id, nid): $perKey")
    assert(listFiles() < filesBefore,
      s"compaction must bound list file counts: $filesBefore -> ${listFiles()}")
  }

  test("index survives a fresh reader: top-1 self-hit on an identical probe") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-ivf2").toString
    Similarity.buildIvfIndex(emb, path, nlist = 4)
    // identical copy of corpus vector 7 must find vec 7 as top-1
    val probe = emb.where(col("vec_id") === 7)
      .select(lit(9999999L).as("vec_id"), col("embedding"))
    val hit = Similarity.searchIvfIndex(spark, path, probe, k = 1, nprobe = 1)
      .select("nid").as[Long].collect()
    assert(hit.toList == List(7L))
  }
}
