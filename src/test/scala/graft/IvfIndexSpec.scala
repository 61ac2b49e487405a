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
    val filesBefore = Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, path)}/lists"))
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
    val filesAfter = Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, path)}/lists"))
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
    def listFiles() = Files.walk(java.nio.file.Paths.get(s"${Similarity.ivfRoot(spark, path)}/lists"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = results()
    val filesBefore = listFiles()
    Similarity.compactIvfIndex(spark, path)
    assert(results() == before, "compaction must not change what search sees")
    val perKey = spark.read.parquet(s"${Similarity.ivfRoot(spark, path)}/lists")
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

  test("ivfDriftStats: a drifted ingest window reads higher than the build-time baseline") {
    // build on x-axis-ish vectors; window 0 = in-distribution, window 1
    // = orthogonal drift. The monitor must separate them numerically —
    // the retrain trigger as a number, not a vibe
    val base = (0L until 60L).map(i =>
      (i, Array(10f, (i % 5).toFloat, 0f))).toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-ivf-drift").toString
    Similarity.buildIvfIndex(base, path, nlist = 2)
    val windows = ((100L until 120L).map(i => (i, Array(10f, (i % 5).toFloat, 0f))) ++
      (200L until 220L).map(i => (i, Array(0f, (i % 5).toFloat, 10f))))
      .toDF("vec_id", "embedding")
    val stats = Similarity.ivfDriftStats(spark, path, windows,
        expr("vec_id div 100").as("batch"))
      .select("batch", "n_vecs", "mean_ppm", "p90_milli", "max_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats.keySet == Set(1L, 2L) && stats(1L)._2 == 20L &&
      stats(2L)._2 == 20L, s"one row per window: $stats")
    assert(stats(2L)._3 > stats(1L)._3 + 100000L,
      s"drifted window must read clearly higher mean_ppm: $stats")
    assert(stats(2L)._4 >= stats(1L)._4 && stats(2L)._5 >= stats(1L)._5,
      s"p90/max must not contradict the mean: $stats")
  }

  test("epoch store: uncommitted (crashed) compaction is invisible; predecessor retained then pruned") {
    val d = (0L until 50L).map(i => (i, Array((i % 7).toFloat, (i % 5).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-ivf-ep").toString
    Similarity.buildIvfIndex(d, path, nlist = 4)
    assert(Similarity.ivfRoot(spark, path).endsWith("state-000000"))
    val probe = Seq((900L, Array(3f, 2f, 1f))).toDF("vec_id", "embedding")
    def results() = Similarity.searchIvfIndex(spark, path, probe, k = 3,
        nprobe = 2)
      .select("nid", "rank").as[(Long, Int)].collect().toSet
    val before = results()
    // crash simulation: half-written epoch, no commit marker
    assert(new java.io.File(s"$path/state-000001/lists").mkdirs())
    assert(Similarity.ivfRoot(spark, path).endsWith("state-000000"),
      "an uncommitted epoch must be invisible to readers")
    assert(results() == before)
    Similarity.compactIvfIndex(spark, path)
    assert(Similarity.ivfRoot(spark, path).endsWith("state-000002"),
      "compaction must skip past the debris epoch number")
    assert(!new java.io.File(s"$path/state-000001").exists,
      "begin() must clear the single writer's crash debris")
    assert(new java.io.File(s"$path/state-000000/_COMMITTED").exists,
      "the immediate predecessor epoch must survive for reader grace")
    assert(results() == before, "compaction must not change search results")
    Similarity.compactIvfIndex(spark, path)
    assert(!new java.io.File(s"$path/state-000000").exists,
      "epochs older than the predecessor must be pruned")
    assert(results() == before)
  }

  test("legacy pre-epoch layout fails fast with a rebuild message") {
    val path = Files.createTempDirectory("graft-ivf-legacy").toString
    // simulate an r17-shaped index: lists/centroids at the top level
    Seq((0, Seq(0.0, 1.0))).toDF("list_id", "centroid")
      .write.parquet(s"$path/centroids")
    val probe = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      Similarity.searchIvfIndex(spark, path, probe, k = 1)
    }
    assert(ex.getMessage.contains("rebuild") && ex.getMessage.contains(path),
      s"expected an explicit rebuild message: ${ex.getMessage}")
  }

  test("hot-list skew: an all-identical ingest lands in ONE list and search stays list-bounded") {
    // the dedup-ingest pathology, IVF edition (r17 verdict item 4):
    // identical vectors all assign to one centroid's list. That is the
    // DESIGN — a probe reads exactly its nprobe lists, so search cost
    // is bounded by the probed lists' occupancy, and the per-(qid,nid)
    // fold keeps replayed appends out of the top-k. Pinned here:
    // assignment concentration, replay-invariant results, and the
    // probe scan touching one list partition.
    val base = (0L until 2000L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-ivf-hot").toString
    Similarity.buildIvfIndex(base, path, nlist = 4)
    val batch = (10000L until 10500L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, path, batch)
    Similarity.appendToIvfIndex(spark, path, batch) // crash replay
    val root = Similarity.ivfRoot(spark, path)
    val byList = spark.read.parquet(s"$root/lists")
      .groupBy("list_id").count().as[(Int, Long)].collect().toMap
    assert(byList.size == 1 && byList.head._2 == 2000L + 2 * 500L,
      s"identical vectors must concentrate in one list: $byList")
    // parquet-backed, filtered probe — the production shape (DPP's
    // insertion heuristic needs a filterable scan on the probe side;
    // a one-row LocalRelation probe prunes via the broadcast join but
    // plans no dynamicpruning subquery)
    val probeDir = Files.createTempDirectory("graft-ivf-hot-probe")
      .toString + "/probes"
    Seq((99999L, Array(1f, 0f, 0f)), (99998L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding").write.parquet(probeDir)
    val probe = spark.read.parquet(probeDir).where(col("vec_id") === 99999L)
    val got = Similarity.searchIvfIndex(spark, path, probe, k = 3, nprobe = 1)
      .select("nid").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L),
      s"hot-list search must fold replays and tie-break by nid: $got")
    // the probed scan prunes to the single hot list's partition
    val plan = Similarity.searchIvfIndex(spark, path, probe, k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"probe-list partition pruning missing:\n${plan.take(2000)}")
  }
}
