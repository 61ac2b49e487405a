package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.GraphAnn

class GraphAnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Current committed epoch root — stores live under it in layout v4. */
  private def root(path: String): String = GraphAnn.indexRoot(spark, path)

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
    // entry routing selects by the vb partition column of the slim
    // bucket sidecar -> its scan must carry a dynamic pruning filter
    // (the search result itself is checkpoint-materialized stagewise,
    // so the routing leg's plan is asserted directly)
    val plan = GraphAnn.routingCandidates(spark, path, probes)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on vb:\n${plan.take(3000)}")
  }

  test("appendToGraphIndex: batch searchable, back-edges reach new nodes, only touched dirs gain files") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 5,
      refineRounds = 0)
    def dirFiles(sub: String, prefix: String): Map[String, Int] =
      new java.io.File(s"${root(path)}/$sub").listFiles()
        .filter(_.getName.startsWith(prefix)).map(f =>
          f.getName -> f.listFiles().length).toMap
    val vecBefore = dirFiles("vectors", "shard=")
    val bktBefore = dirFiles("buckets", "vb=")
    // batch: exact twins of sources 0..2 at +1000 (same b0 as source)
    val batch = emb.where(col("vec_id") < 3).select(
      (col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    GraphAnn.appendToGraphIndex(spark, path, batch)
    // vectors are id-sharded: ids 1000..1002 hash to shards 40..42;
    // the routing sidecar is bucket-grouped: <=6 distinct (t, b) groups
    val vecTouched = dirFiles("vectors", "shard=").filter { case (d, n) =>
      vecBefore.getOrElse(d, 0) < n }
    assert(vecTouched.nonEmpty && vecTouched.size <= 3 &&
      vecTouched.keySet.subsetOf(Set("shard=40", "shard=41", "shard=42")),
      s"appends must touch only the batch's id shards: $vecTouched")
    assert(vecBefore.forall { case (d, n) =>
      vecTouched.contains(d) || dirFiles("vectors", "shard=")(d) == n },
      "untouched vector shards must keep their file count")
    val bktTouched = dirFiles("buckets", "vb=").filter { case (d, n) =>
      bktBefore.getOrElse(d, 0) < n }
    assert(bktTouched.nonEmpty && bktTouched.size <= 6,
      s"appends must touch only the batch's bucket groups (3 ids x 2 views): $bktTouched")
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
    val corpus = spark.read.parquet(s"${root(path)}/vectors")
      .select(col("nid").as("vec_id"), col("nvec").as("embedding"))
    val edges = spark.read.parquet(s"${root(path)}/edges")
    val viaHop = GraphAnn.beamSearch(probes, corpus, edges, Some(entries),
        k = 2, beam = 8, hops = 1)
      .where(col("rank") === 2)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(viaHop == Map(2000L -> 1000L, 2001L -> 1001L, 2002L -> 1002L),
      s"back-edge traversal failed: $viaHop")
  }

  test("searchGraphIndex: empty-bucket probe enters at the persisted sample, not zero rows") {
    // one-direction corpus -> one b0 bucket; the negated probe's bucket
    // directory does not exist, so pre-fix the entry join was empty and
    // the search silently returned nothing
    val d = (0L until 10L).map(i => (i, Array((i + 1).toFloat, 0f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 4, refineRounds = 0)
    assert(new java.io.File(s"${root(path)}/entrysample").exists,
      "build must persist the routing-fallback sample")
    val probe = Seq((100L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val got = GraphAnn.searchGraphIndex(spark, path, probe, k = 3,
        beam = 4, hops = 1)
      .select("rank", "nid").as[(Int, Long)].collect().sorted
    assert(got.toSeq == Seq((1, 0L), (2, 1L), (3, 2L)),
      s"index fallback routing failed: ${got.toSeq}")
  }

  test("searchGraphIndex: id reuse resolves to the lexicographically-min vector, deterministically") {
    val d = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 0, refineRounds = 0)
    // contract violation on purpose: id 1 re-appended with DIFFERENT
    // contents; the survivor must be the lexicographic minimum
    // ([0,1] < [1,0.1] on the first component), not an arbitrary row
    val reuse = Seq((1L, Array(1f, 0.1f))).toDF("vec_id", "embedding")
    GraphAnn.appendToGraphIndex(spark, path, reuse)
    val probe = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val sims = GraphAnn.searchGraphIndex(spark, path, probe, k = 2,
        beam = 4, hops = 2)
      .select("nid", "sim").as[(Long, Double)].collect().toMap
    assert(sims.get(1L).exists(_ < 0.1),
      s"id 1 must score as its min-vector survivor [0,1] (cos 0): $sims")
  }

  test("compactGraphIndex: search-invariant, degree re-trimmed, vectors deduped, files bounded") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 5,
      refineRounds = 0)
    val batch = emb.where(col("vec_id") < 3).select(
      (col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    // two identical appends = a replayed micro-batch: duplicated vector
    // rows, duplicated forward and back edges, drifted effective degree
    GraphAnn.appendToGraphIndex(spark, path, batch)
    GraphAnn.appendToGraphIndex(spark, path, batch)
    val probes = emb.where(col("vec_id") < 3).select(
      (col("vec_id") + 2000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    def results() = GraphAnn.searchGraphIndex(spark, path, probes, k = 2,
        beam = 8, hops = 1)
      .select("qid", "nid", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    def edgeFiles() = {
      val fs = new java.io.File(s"${root(path)}/edges")
      fs.listFiles().filter(_.isDirectory)
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val before = results()
    val filesBefore = edgeFiles()
    GraphAnn.compactGraphIndex(spark, path)
    assert(results() == before,
      "compaction must not change what search sees")
    // folded duplicates + re-trim: per-src degree bound restored
    val perSrc = spark.read.parquet(s"${root(path)}/edges")
      .groupBy("src").count().agg(max("count")).as[Long].head()
    assert(perSrc <= 4, s"max effective degree after compact: $perSrc")
    val perNid = spark.read.parquet(s"${root(path)}/vectors")
      .groupBy("nid").count().agg(max("count")).as[Long].head()
    assert(perNid == 1, s"vector rows must dedupe to one per id: $perNid")
    assert(edgeFiles() <= filesBefore,
      s"compaction must bound edge file counts: $filesBefore -> ${edgeFiles()}")
  }

  test("layout gate: a pre-v3 index fails fast with a rebuild message, not a join error") {
    val path = Files.createTempDirectory("graft-gann").toString
    // an r16-shaped meta: (planes, degree, tables), no layout column
    Seq((5, 4, 2)).toDF("planes", "degree", "tables")
      .coalesce(1).write.parquet(s"$path/meta")
    val probe = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      GraphAnn.searchGraphIndex(spark, path, probe, k = 1, beam = 1)
    }
    assert(ex.getMessage.contains("rebuild") && ex.getMessage.contains(path),
      s"expected an explicit rebuild message: ${ex.getMessage}")
  }

  test("appendToGraphIndex: hot-bucket ingest is capped, replay writes no self-loops") {
    // all-identical vectors -> ONE bucket: the dedup-ingest workload
    // that made the uncapped append quadratic in bucket occupancy
    val base = (0L until 6L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(base, path, degree = 2, planes = 4,
      maxBucket = 4, refineRounds = 0)
    val batch = (100L until 120L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    GraphAnn.appendToGraphIndex(spark, path, batch)
    GraphAnn.appendToGraphIndex(spark, path, batch) // crash replay
    val edges = spark.read.parquet(s"${root(path)}/edges")
    assert(edges.where(col("src") === col("dst")).count() == 0,
      "replayed appends must not write self-loop edges")
    // pair volume pinned: each append scores <= |batch| * 2*maxBucket
    // candidates, so per-src out-edges stay <= degree per append wave
    // (2 appends -> <= 2*degree forward rows per batch src)
    val perBatchSrc = edges.where(col("src") >= 100L)
      .groupBy("src").count().agg(max("count")).as[Long].head()
    assert(perBatchSrc <= 4, s"capped append drifted: $perBatchSrc")
    // the capped mates are the lowest ids: back-edges land only on
    // bucket nodes 0..3 (maxBucket=4), never on 4..5
    val backSrcs = edges.where(col("src") < 6L).select("src")
      .distinct().as[Long].collect().toSet
    assert(backSrcs.subsetOf(Set(0L, 1L, 2L, 3L)),
      s"back-edges must target only the capped lowest-id mates: $backSrcs")
    // every batch node is still searchable via entry routing even
    // beyond the cap (stores keep all rows; only edge fan-out is capped)
    val probe = Seq((9999L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = GraphAnn.searchGraphIndex(spark, path, probe, k = 3,
        beam = 8, hops = 1)
      .select("nid").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L), s"hot-bucket index must stay searchable: $got")
  }

  test("entry routing is capped at meta max_bucket: hot-bucket closure stays bounded") {
    // 300 identical vectors -> ONE hot bucket (the dedup-ingest
    // workload). Pre-r18 a routed probe's entry set was the WHOLE
    // bucket: entry join, scoring and reachability closure all
    // O(occupancy). The cap carries the build/append skew discipline
    // to the read path: maxBucket lowest nids per query.
    val d = (0L until 300L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 4,
      maxBucket = 16, refineRounds = 0)
    val probe = Seq((9999L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val routed = GraphAnn.routingCandidates(spark, path, probe)
      .select("nid").as[Long].collect()
    assert(routed.length == 16 && routed.toSet == (0L until 16L).toSet,
      s"routing must keep exactly the maxBucket lowest nids: " +
        s"${routed.sorted.take(20).toSeq}")
    // closure bound: <= |entries| * (degree+1)^hops, corpus-independent
    val entries = probe.select(lit(9999L).as("qid"))
      .crossJoin(routed.toSeq.toDF("nid"))
    val (reach, _) = GraphAnn.reachClosure(spark, root(path), entries, hops = 2)
    val closure = reach.count()
    assert(closure <= 16L * 9L && closure < 300L,
      s"hot-bucket closure must stay entry-bounded: $closure")
    // and the search itself is still correct: ties at cos 1.0 resolve
    // nid-ascending, so top-3 is the three lowest ids
    val got = GraphAnn.searchGraphIndex(spark, path, probe, k = 3,
        beam = 8, hops = 2)
      .select("nid").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L), s"capped hot-bucket search: $got")
    // in-memory twin: beamSearch's own routing under the same cap
    val edges = spark.read.parquet(s"${root(path)}/edges").select("src", "dst", "sim")
    val inMem = GraphAnn.beamSearch(probe, d, edges, k = 3, beam = 8,
        hops = 2, planes = 4, maxBucket = 16)
      .select("nid").as[Long].collect().toSet
    assert(inMem == Set(0L, 1L, 2L), s"in-memory capped routing: $inMem")
  }

  test("closure superset property: searchGraphIndex == full-store beamSearch on random data") {
    // the frontier-bounded search promises BYTE-identical results to
    // walking the whole store; certificates pin planted cases, this
    // pins arbitrary geometry (random vectors, in- and out-of-
    // distribution probes, fallback seeding included)
    def mix(x: Long): Long = {
      var h = x * 0x9E3779B97F4A7C15L
      h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 29
      h
    }
    def vec(seed: Long) = Array.tabulate(12) { j =>
      ((mix(seed * 131 + j) >>> 11).toDouble / (1L << 53).toDouble * 2 - 1).toFloat }
    val d = (0L until 3000L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 4, planes = 6, refineRounds = 1)
    val probes = (0L until 24L).map(i => (i + 10000L, vec(i + 777000L)))
      .toDF("vec_id", "embedding")
    val got = GraphAnn.searchGraphIndex(spark, path, probes, k = 5,
        beam = 12, hops = 2)
      .select("qid", "nid", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    // reference: the identical walk over the FULL persisted store
    val corpus = spark.read.parquet(s"${root(path)}/vectors")
      .groupBy("nid").agg(min("nvec").as("nvec"))
      .select(col("nid").as("vec_id"), col("nvec").as("embedding"))
    val edges = spark.read.parquet(s"${root(path)}/edges").select("src", "dst")
    val routed = GraphAnn.routingCandidates(spark, path, probes)
    val lonely = probes.select(col("vec_id").as("qid"))
      .join(routed.select("qid"), Seq("qid"), "left_anti")
    val seeds = spark.read.parquet(s"${root(path)}/entrysample")
      .orderBy(col("nid").asc).limit(12)
    val entries = routed.unionByName(
      lonely.crossJoin(seeds).where(col("qid") =!= col("nid"))
        .select("qid", "nid"))
    val want = GraphAnn.beamSearch(probes, corpus, edges, Some(entries),
        k = 5, beam = 12, hops = 2, planes = 6)
      .select("qid", "nid", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == want && got.nonEmpty,
      s"closure-bounded search diverged from the full-store walk: " +
        s"${(got -- want).take(3)} / ${(want -- got).take(3)}")
  }

  test("fetchVectors: subset-exact under shard+range pruning, min survivor, empty-safe") {
    // ids 0, 1, 66, 130: shards 0, 1, 2, 2 — the requested subset spans
    // shard dirs and id ranges, so both pruning legs are on the hook
    val d = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (66L, Array(0.5f, 0.5f)), (130L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 0, refineRounds = 0)
    // contract-violating reuse: id 1 re-appended with different contents
    GraphAnn.appendToGraphIndex(spark, path,
      Seq((1L, Array(1f, 0.1f))).toDF("vec_id", "embedding"))
    val ids = Seq(1L, 130L, 999L).toDF("nid") // 999 absent from the store
    val got = GraphAnn.fetchVectors(spark, root(path), ids)
      .as[(Long, Array[Float])].collect().toMap
    assert(got.keySet == Set(1L, 130L),
      s"fetch must return exactly the present requested ids: ${got.keySet}")
    assert(got(1L).toSeq == Seq(0f, 1f),
      s"id reuse must resolve to the lexicographic-min vector: ${got(1L).toSeq}")
    assert(got(130L).toSeq == Seq(0.1f, 0.9f))
    // empty id frame: no driver collect surprises, right schema
    val empty = GraphAnn.fetchVectors(spark, root(path),
      ids.where(org.apache.spark.sql.functions.lit(false)))
    assert(empty.isEmpty && empty.columns.toSeq == Seq("nid", "nvec"))
  }

  test("registry memo: one built graph serves repeated certificate calls") {
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val g1 = registry.GraphAnnRegistry.graph(emb, "memo-test-a")
    val g2 = registry.GraphAnnRegistry.graph(emb, "memo-test-a")
    assert(g1 eq g2, "same (app, sf) key must return the memoized frame")
    val g3 = registry.GraphAnnRegistry.graph(emb, "memo-test-b")
    assert(!(g3 eq g1), "a different sf key must rebuild")
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

  test("epoch store: readers ignore an uncommitted (crashed) epoch; compaction keeps the predecessor") {
    val d = (0L until 20L).map(i => (i, Array((i + 1).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 4, refineRounds = 0)
    val r0 = root(path)
    assert(r0.endsWith("state-000000"), s"first build must commit epoch 0: $r0")
    val probe = Seq((100L, Array(5f, 1f))).toDF("vec_id", "embedding")
    def results() = GraphAnn.searchGraphIndex(spark, path, probe, k = 3,
        beam = 8, hops = 1)
      .select("nid", "rank").as[(Long, Int)].collect().toSet
    val before = results()
    // crash simulation: a compaction died mid-write — a state dir with
    // partial junk and NO commit marker. Readers must not see it.
    val crashed = new java.io.File(s"$path/state-000001/edges")
    assert(crashed.mkdirs())
    assert(root(path) == r0, "an uncommitted epoch must be invisible")
    assert(results() == before,
      "search through a crash-debris epoch must be unchanged")
    // the next writer cycle clears the debris and commits epoch 2
    GraphAnn.compactGraphIndex(spark, path)
    val r2 = root(path)
    assert(r2.endsWith("state-000002"),
      s"compaction must skip past the debris epoch number: $r2")
    assert(!new java.io.File(s"$path/state-000001").exists,
      "begin() must delete the single writer's crash debris")
    assert(new java.io.File(s"$path/state-000000/_COMMITTED").exists,
      "the immediate predecessor epoch must survive for reader grace")
    assert(results() == before, "compaction must not change search results")
    // a second compaction prunes epoch 0 (two-epoch retention)
    GraphAnn.compactGraphIndex(spark, path)
    assert(root(path).endsWith("state-000003"))
    assert(!new java.io.File(s"$path/state-000000").exists,
      "epochs older than the predecessor must be pruned")
    assert(results() == before)
  }

  test("layout v4: IntegerType ids build, append and search (r17 advice)") {
    // pre-fix idEnvelope read shard min/max with getAs[Long] and threw
    // ClassCastException the moment the store held int ids
    val d = (0 until 30).map(i => (i, Array((i + 1).toFloat, 1f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(d, path, degree = 2, planes = 4, refineRounds = 0)
    GraphAnn.appendToGraphIndex(spark, path,
      Seq((1000, Array(31f, 1f))).toDF("vec_id", "embedding")
        .select(col("vec_id").cast("int").as("vec_id"), col("embedding")))
    val probe = Seq((5000, Array(40f, 1f))).toDF("vec_id", "embedding")
      .select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val got = GraphAnn.searchGraphIndex(spark, path, probe, k = 1,
        beam = 8, hops = 1)
      .select("nid").collect().map(_.getAs[Number]("nid").longValue).toSeq
    assert(got == Seq(1000L),
      s"int-id index must search end to end (append included): $got")
  }

  test("rebuild with new geometry is a new epoch: stale cached meta can never route a search") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val path = Files.createTempDirectory("graft-gann").toString
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 5,
      refineRounds = 0)
    val r0 = root(path)
    GraphAnn.searchGraphIndex(spark, path,
      emb.where(col("vec_id") < 1).select((col("vec_id") + 1000L).as("vec_id"),
        col("embedding")), k = 1, beam = 4, hops = 0).collect()
    // rebuild with DIFFERENT geometry (planes=9): a reader holding the
    // old meta by path would hash probes into the wrong buckets; the
    // epoch-keyed memo makes that structurally impossible
    GraphAnn.buildGraphIndex(emb, path, degree = 4, planes = 9,
      refineRounds = 0)
    assert(root(path) != r0, "a rebuild must commit a NEW epoch")
    val probes = emb.where(col("vec_id") < 2).select(
      (col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val top1 = GraphAnn.searchGraphIndex(spark, path, probes, k = 1,
        beam = 4, hops = 0)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(top1 == Map(1000L -> 0L, 1001L -> 1L),
      s"post-rebuild search must use the new epoch's geometry: $top1")
  }
}
