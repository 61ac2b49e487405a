package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{Ledger, StreamGk}

/** Long-run ledger-compaction smoke (round-11 verdict item): drive the
  * GK resident monitor through ~1k micro-batches — the partition count
  * a 5 s-trigger monitor accumulates in ~1.4 h — with auto-compaction
  * cadence, against an UNCOMPACTED twin ledger fed the identical
  * batches. Evidence pinned:
  *
  *   1. the compacted ledger's label count stays bounded by the
  *      compaction cadence (the unbounded-growth failure mode closed in
  *      round 11 stays closed at real batch counts, not just the
  *      LedgerCompactSpec's dozens);
  *   2. lifetime quantiles from the compacted ledger equal the
  *      uncompacted fold VALUE FOR VALUE (the compaction exactness
  *      contract at 1k-batch depth);
  *   3. both land within the GK rank envelope (2εN + 2, the q175
  *      certificate bound) of the true ranks over all N values,
  *      recomputed exactly from the batch formula driver-side.
  *
  * Batches are tiny on purpose — the smoke measures LEDGER mechanics
  * (partition growth, fold depth, compaction), not scan throughput,
  * which ScaleSmoke already covers. Writes nothing outside /tmp. */
object LedgerSmoke {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(1000)
    val rows = 200
    val compactEvery = 64
    val eps = 0.01
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    val dirC = Files.createTempDirectory("gk_ledger_c").toString
    val dirU = Files.createTempDirectory("gk_ledger_u").toString
    def batchDf(b: Int) = spark.range(rows).select(
      (((col("id") + b.toLong * rows) * 7919L) % 1000003L)
        .cast("double").as("x"))
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      val df = batchDf(b).localCheckpoint(true) // identical rows to both
      StreamGk.summaryBatch(df, b, "x", eps, dirC)
      StreamGk.summaryBatch(df, b, "x", eps, dirU)
      // the start(compactEvery) cadence: fold through b−1 (committed)
      if (b >= 2 && b % compactEvery == 0)
        StreamGk.compact(spark, dirC, b - 1, eps)
    }
    val ingestS = (System.nanoTime() - t0) / 1e9
    def partitions(dir: String): Int =
      new java.io.File(dir).list().count(_.startsWith("_batch="))
    val pc = partitions(dirC)
    val pu = partitions(dirU)
    println(f"ledgerSmoke($nBatches batches x $rows rows): ingest+compact ${ingestS}%.1f s "
      + f"(${ingestS / nBatches * 1000}%.0f ms/batch incl. twin)")
    println(s"partitions: compacted ledger $pc, uncompacted $pu, "
      + s"watermark ${Ledger.watermark(spark, dirC)}")
    // 1. bounded: newest compacted partition + at most compactEvery
    //    positives above it (+1 for the in-flight cadence slot)
    assert(pc <= compactEvery + 2, s"ledger grew unbounded: $pc partitions")
    assert(pu == nBatches, s"twin must hold every batch: $pu")
    // 2. compacted lifetime == uncompacted lifetime, value for value
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    var t1 = System.nanoTime()
    val qc = StreamGk.quantiles(spark, dirC, eps, ps).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val readC = (System.nanoTime() - t1) / 1e9
    t1 = System.nanoTime()
    val qu = StreamGk.quantiles(spark, dirU, eps, ps).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val readU = (System.nanoTime() - t1) / 1e9
    println(f"lifetime read: compacted ${readC}%.1f s ($pc parts), "
      + f"uncompacted ${readU}%.1f s ($pu parts)")
    ps.foreach(p => assert(qc(p) == qu(p),
      s"compaction changed q($p): ${qc(p)} vs ${qu(p)}"))
    // 3. rank envelope vs the exact values (driver replay of the
    //    formula — N doubles, a smoke-sized sort)
    val n = nBatches.toLong * rows
    val all = Array.tabulate(n.toInt)(i => (i.toLong * 7919L % 1000003L).toDouble)
    java.util.Arrays.sort(all)
    val slack = 2.0 * eps * n + 2.0
    ps.foreach { p =>
      val q = qc(p)
      val lo = all.count(_ < q).toDouble
      val hi = all.count(_ <= q).toDouble
      val target = p * n
      assert(target >= lo - slack && target <= hi + slack,
        s"q($p)=$q rank [$lo,$hi] misses target $target by more than $slack")
    }
    println(s"ledgerSmoke OK: bounded=$pc<=${compactEvery + 2}, "
      + s"exact-equal=${ps.size} quantiles, rank-envelope=${ps.size} pass")
    spark.stop()
  }
}
