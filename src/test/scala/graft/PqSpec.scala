package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  // 4 well-separated clusters of 15 vectors each; jitter is deterministic
  // and distinct per id (23 prime, stride 4 < 23) so no two corpus
  // vectors are equal — ADC ties then come only from code collisions
  private def vec(id: Long): Seq[Double] = {
    val cl = (id % 4).toInt
    (0 until dim).map(j => cl * 10.0 + ((id * 31 + j * 17) % 23) * 0.1)
  }
  private lazy val corpus =
    (0L until 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding")

  test("pqEncode: m codes in [0, ksub); deterministic; ragged rows -> null") {
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 4)
    assert(books.length == 4 && books.forall(_.length == 4) &&
      books.forall(_.forall(_.length == dim / 4)))
    val enc = Similarity.pqEncode(corpus, books)
    val rows = enc.select("codes").as[Seq[Int]].collect()
    assert(rows.length == 60)
    assert(rows.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 4)))
    val again = Similarity.pqEncode(corpus, books).select("codes").as[Seq[Int]].collect()
    assert(rows.toSeq == again.toSeq)

    val ragged = Seq((99L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    assert(Similarity.pqEncode(ragged, books).where(col("codes").isNull).count() == 1)
  }

  test("pqKnn: every query's own vector shares the minimal ADC distance") {
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 8)
    val enc = Similarity.pqEncode(corpus, books)
    val queries = corpus.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    // a vector's own codes minimize the ADC sum (per subspace the encode
    // argmin IS the lut minimum) — but another vector may encode to the
    // SAME codes, so the guarantee is distance-minimality, not rank 1
    val rows = Similarity.pqKnn(queries, enc, books, k = 5)
      .select("qid", "nid", "adist").as[(Long, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      val mn = rs.map(_._3).min
      val self = rs.find(_._2 == q - 1000L)
      assert(self.exists(_._3 == mn), s"query $q: self not at minimal ADC ($rs)")
    }
  }

  test("ivfPqKnn: coarse-pruned ADC still self-retrieves; candidates shrink") {
    val cents = Similarity.fitCentroids(corpus, nlist = 4, maxIter = 5)
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 8)
    val queries = corpus.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val res = Similarity.ivfPqKnn(queries, corpus, cents, books, k = 3, nprobe = 1)
    val rows = res.select("qid", "nid", "adist").as[(Long, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      val mn = rs.map(_._3).min
      assert(rs.exists(r => r._2 == q - 1000L && r._3 == mn),
        s"query $q: self not at minimal ADC ($rs)")
    }
    // nprobe=1 with 4 balanced clusters: each query ranks ~1/4 of the
    // corpus, so no query may return neighbors from another cluster
    val crossCluster = res.where((col("nid") % 4) =!= ((col("qid") - 1000L) % 4)).count()
    assert(crossCluster == 0, s"$crossCluster cross-cluster neighbors at nprobe=1")
  }

  test("persisted IVF-PQ index: search == in-memory ivfPqKnn; append searchable") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.buildIvfPqIndex(corpus, path, nlist = 4, m = 4, ksub = 8)
    val queries = corpus.where(col("vec_id") < 6)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))

    val indexed = Similarity.searchIvfPqIndex(spark, path, queries, k = 3, nprobe = 2)
    val cents = Similarity.fitCentroids(corpus, nlist = 4) // same seed -> same model
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 8)
    val direct = Similarity.ivfPqKnn(queries, corpus, cents, books, k = 3, nprobe = 2)
    val a = indexed.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val b = direct.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a.nonEmpty && a == b,
      s"indexed vs direct diverged: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")

    // append an exact copy of vector 3 under a new id: encodes to the
    // same codes, so probing with the original must see it at the same
    // minimal ADC distance
    val twin = corpus.where(col("vec_id") === 3)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfPqIndex(spark, path, twin)
    // k covers the whole probed list: clustermates can share the twin's
    // codes (coarse ksub lumps nearby subvectors), so the twin may tie
    // with several smaller nids — presence at minimal ADC is the contract
    val probe = corpus.where(col("vec_id") === 3)
    val rows = Similarity.searchIvfPqIndex(spark, path, probe, k = 20, nprobe = 1)
      .select("nid", "adist").as[(Long, Double)].collect()
    val mn = rows.map(_._2).min
    assert(rows.exists(r => r._1 == 5003L && r._2 == mn),
      s"appended twin not at minimal ADC: ${rows.mkString(",")}")
  }

  test("replayed PQ append: duplicated code row holds one rank per (qid, nid)") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-rp").toString
    Similarity.buildIvfPqIndex(corpus, path, nlist = 4, m = 4, ksub = 8)
    val twin = corpus.where(col("vec_id") === 3)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    // the same batch lands twice — the crash-replay shape; pre-fix the
    // duplicated (nid, codes) row produced TWO ranked rows for nid 5003
    Similarity.appendToIvfPqIndex(spark, path, twin)
    Similarity.appendToIvfPqIndex(spark, path, twin)
    val probe = corpus.where(col("vec_id") === 3)
    def results() = Similarity.searchIvfPqIndex(spark, path, probe,
        k = 20, nprobe = 1)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val rows = results().toSeq.map(_._2)
    assert(rows.length == rows.distinct.length,
      s"each nid must hold exactly one rank: ${rows.mkString(",")}")
    assert(rows.contains(5003L), "appended twin still searchable")
    // compaction folds the replay duplicates without changing what
    // search sees, and resets the lists to one row per (list_id, nid)
    val before = results()
    Similarity.compactIvfPqIndex(spark, path)
    assert(results() == before, "PQ compaction changed search results")
    val perKey = spark.read.parquet(s"${Similarity.ivfRoot(spark, path)}/lists")
      .groupBy("list_id", "nid").count().agg(max("count")).as[Long].head()
    assert(perKey == 1, s"lists must fold to one row per (list_id, nid): $perKey")
  }

  test("ivfPqKnn + rerankExact: exact-copy probes come back strict top-1") {
    val cents = Similarity.fitCentroids(corpus, nlist = 4, maxIter = 5)
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 8)
    val queries = corpus.where(col("vec_id") < 6)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    // wide shortlist from the compressed index, then true cosine on just
    // those pairs: quantization ties vanish under full precision, so the
    // exact copy must rank strictly first (cos = 1, no equal vectors)
    val shortlist = Similarity.ivfPqKnn(queries, corpus, cents, books, k = 20, nprobe = 2)
    val top1 = Similarity.rerankExact(shortlist, queries, corpus, k = 3)
      .where(col("rank") === 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    assert(top1.size == 6)
    assert(top1.forall { case (q, n) => n == q - 1000L }, top1.toString)
  }

  test("residual IVF-PQ: self at minimal ADC in own list; quantization error shrinks") {
    val cents = Similarity.fitCentroids(corpus, nlist = 4, maxIter = 5)
    val plain = Similarity.pqTrain(corpus, m = 4, ksub = 4)
    val resid = Similarity.pqTrainResidual(corpus, cents, m = 4, ksub = 4)
    val queries = corpus.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))

    // nprobe=1 keeps the minimality argument airtight: only the query's
    // own list is scored, and there its own residual codes are the
    // per-subspace LUT argmin
    val rows = Similarity.ivfPqKnnResidual(queries, corpus, cents, resid, k = 5, nprobe = 1)
      .select("qid", "nid", "adist").as[(Long, Long, Double)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 8)
    val selfResid = byQ.map { case (q, rs) =>
      val mn = rs.map(_._3).min
      val self = rs.find(_._2 == q - 1000L)
      assert(self.exists(_._3 == mn), s"query $q: self not at minimal ADC ($rs)")
      self.get._3
    }

    // with codes this coarse (ksub=4) raw-vector PQ must spend them on
    // the +0/+10/+20/+30 cluster offsets; residual codes only cover the
    // jitter, so the self quantization error collapses
    val enc = Similarity.pqEncode(corpus, plain)
    val selfPlain = Similarity.pqKnn(queries, enc, plain, k = 60)
      .where(col("nid") === col("qid") - 1000L)
      .select("adist").as[Double].collect()
    assert(selfResid.sum < selfPlain.sum,
      s"residual error ${selfResid.sum} !< plain ${selfPlain.sum}")
  }

  test("persisted residual index: mode pinned, search == in-memory, append encodes residually") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpqr").toString
    Similarity.buildIvfPqIndex(corpus, path, nlist = 4, m = 4, ksub = 8, residual = true)
    val queries = corpus.where(col("vec_id") < 6)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))

    val indexed = Similarity.searchIvfPqIndex(spark, path, queries, k = 3, nprobe = 1)
    val cents = Similarity.fitCentroids(corpus, nlist = 4) // same seed -> same model
    val books = Similarity.pqTrainResidual(corpus, cents, m = 4, ksub = 8)
    val direct = Similarity.ivfPqKnnResidual(queries, corpus, cents, books, k = 3, nprobe = 1)
    val a = indexed.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val b = direct.select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a.nonEmpty && a == b,
      s"indexed vs direct diverged: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")

    // appended exact copy encodes with the SAME residual mode (a plain-PQ
    // append against a residual index would score garbage): probing with
    // the original sees the twin at the minimal ADC distance
    val twin = corpus.where(col("vec_id") === 3)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfPqIndex(spark, path, twin)
    val rows = Similarity.searchIvfPqIndex(spark, path,
      corpus.where(col("vec_id") === 3), k = 20, nprobe = 1)
      .select("nid", "adist").as[(Long, Double)].collect()
    val mn = rows.map(_._2).min
    assert(rows.exists(r => r._1 == 5003L && r._2 == mn),
      s"appended twin not at minimal ADC: ${rows.mkString(",")}")
  }

  test("pqKnn ranks clustermates above other clusters (ADC preserves geometry)") {
    val books = Similarity.pqTrain(corpus, m = 4, ksub = 8)
    val enc = Similarity.pqEncode(corpus, books)
    val queries = corpus.where(col("vec_id") === 0)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val top = Similarity.pqKnn(queries, enc, books, k = 10)
      .select("nid").as[Long].collect()
    assert(top.length == 10)
    assert(top.forall(_ % 4 == 0), s"non-clustermate in top-10: ${top.mkString(",")}")
  }
}
