package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Composed-pipeline smoke at 10M docs (round-15 verdict item 5): the
  * suite's two heaviest plans — q131's fineWebCurate and q243's
  * contaminationSweep — at 10-20x their previous 1M evidence, with
  * per-phase SHUFFLE VOLUMES recorded via a stage listener so the
  * "would this survive 100x" claim has measured bytes behind it, not
  * just wall-clock. Anything the operators cap (salted domain cap,
  * bucket caps, BM25 k) is logged next to the numbers.
  *
  * Corpus: 32-token docs over a ~1M token alphabet (posting lists
  * stay spread so BM25 stays honest), every 10th doc a near-dup,
  * every 50th an exact dup, 80% lang=en, 50 sources. Token values mix
  * through xxhash64: the raw (id*131 + j*7) mod 1000003 form ALIASES
  * once ids pass the modulus — doc id and id+1000003 were
  * byte-identical, so beyond 1M docs span-dedup rightly consumed the
  * whole corpus (kept_text collapsed to nothing) and its postings
  * exchanges exploded (two ENOSPC kills on this box's 80 GB of
  * shuffle disk — a composed plan holds every stage's files at once).
  */
object PipelineSmoke {

  private class ShuffleMeter extends SparkListener {
    @volatile var writeBytes = 0L
    @volatile var readBytes = 0L
    @volatile var spillBytes = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        writeBytes += m.shuffleWriteMetrics.bytesWritten
        readBytes += m.shuffleReadMetrics.totalBytesRead
        spillBytes += m.diskBytesSpilled
      }
    }
    def snapshot: (Long, Long, Long) = (writeBytes, readBytes, spillBytes)
  }

  private def gb(b: Long): String = f"${b / 1e9}%.2f GB"

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000000)
    // memory comes from SPARK_DRIVER_MEM (build.sbt -Xmx): run with
    // SPARK_DRIVER_MEM=100g for the 10M default
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR"); Conf.ensure(spark)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val docs = spark.range(n).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) === 0 && col("id") >= 10,
          concat_ws(" ", transform(sequence(lit(1), lit(32)),
            j => concat(lit("tok"), pmod(xxhash64((col("id") - 1) * 131 + j * 7),
              lit(1000003)), lit("_"),
              when(j === 16, lit("CHANGED")).otherwise(j.cast("string"))))))
          .when(pmod(col("id"), lit(50)) === 0 && col("id") >= 50,
            concat_ws(" ", transform(sequence(lit(1), lit(32)),
              j => concat(lit("tok"), pmod(xxhash64((col("id") - 2) * 131 + j * 7),
                lit(1000003)), lit("_"), j))))
          .otherwise(concat_ws(" ", transform(sequence(lit(1), lit(32)),
            j => concat(lit("tok"), pmod(xxhash64(col("id") * 131 + j * 7),
              lit(1000003)), lit("_"), j)))).as("text"),
        when(pmod(col("id"), lit(10)) < 8, "en").otherwise("de").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(50))).as("source"))
      .repartition(64).persist()
    println(s"corpus: ${docs.count()} docs")

    // --- q131 composition: fineWebCurate. q131's capPerSource=12 is
    // sized for the 500-doc testdata; here a 100k cap keeps the
    // salted-cap stage non-degenerate while still binding per source.
    // DISK BOUND, measured: one action holds every exchange's shuffle
    // files at once, and the composed fineweb pass at 10M x 32-token
    // docs consumed >78 GB of shuffle before ENOSPC even with the
    // alias-free corpus (the 4M pass lands ~37 GB written) — this box
    // tops out between 4M and 10M docs for THIS composition, so the
    // fineweb phase runs at 4M and prints the volumes as the
    // extrapolation basis; the contamination phase, whose legs
    // broadcast or stay narrow, runs at the full n. ---
    val nFw = math.min(n, 4000000)
    val fwDocs = docs.where(col("doc_id") < nFw)
    var s0 = meter.snapshot
    var t0 = System.nanoTime()
    val curated = ops.Pipeline.fineWebCurate(fwDocs, capPerSource = 100000)
    val kept = curated.count()
    var s1 = meter.snapshot
    println(f"fineWebCurate($nFw docs): ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"$kept kept of $nFw; shuffle write ${gb(s1._1 - s0._1)}, " +
      s"read ${gb(s1._2 - s0._2)}, spill ${gb(s1._3 - s0._3)} " +
      "(capPerSource=100000 — the one bounded stage)")
    assert(kept > 0L && kept < nFw.toLong, "the gates must actually bite")

    // --- q243 composition: contaminationSweep (bench = 500 verbatim
    // corpus prefixes + 100 fresh items; semantic leg on 64-dim formula
    // vectors; caps logged: BM25 k=3, ANN k=3) ---
    val tk = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val bench = docs.where(pmod(col("doc_id"), lit(n.toLong / 500)) === 0)
      .select(col("doc_id").as("bench_id"),
        array_join(slice(tk, 1, 24), " ").as("text"))
      .unionByName(spark.range(100).select((col("id") + 2000000000L).as("bench_id"),
        concat_ws(" ", (1 to 8).map(j =>
          concat(lit("benchfresh"), col("id"), lit(s"_$j"))): _*).as("text")))
      .persist()
    println(s"bench: ${bench.count()} items")
    def vecs(ids: org.apache.spark.sql.DataFrame, idCol: String) =
      ids.select(col(idCol).as("vec_id"),
        transform(sequence(lit(1), lit(64)), j =>
          (pmod(xxhash64(col(idCol) * 64 + j, lit(97)), lit(2001L)) - 1000L)
            .cast("float") / lit(1000.0f)).as("embedding"))
    val docVecs = vecs(docs.select(col("doc_id")), "doc_id")
    val benchVecs = vecs(bench.select(col("bench_id")), "bench_id")
    s0 = meter.snapshot
    t0 = System.nanoTime()
    val sweep = ops.Pipeline.contaminationSweep(docs, bench, docVecs, benchVecs)
      .persist()
    val byReason = sweep.groupBy(col("verdict")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    s1 = meter.snapshot
    println(f"contaminationSweep($n docs, 600 bench): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s, verdicts $byReason; " +
      s"shuffle write ${gb(s1._1 - s0._1)}, read ${gb(s1._2 - s0._2)}, " +
      s"spill ${gb(s1._3 - s0._3)} (caps: bm25 k=3, ann k=3)")
    // every verbatim bench item's SOURCE doc must be flagged lexically:
    // 24-token prefixes shared verbatim -> gram overlap >= threshold
    val flagged = sweep.where(col("verdict") === "lexical")
      .join(bench.where(col("bench_id") < 2000000000L)
        .select(col("bench_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .count()
    println(s"planted lexical recall: $flagged/500 source docs flagged")
    assert(flagged >= 495L, s"verbatim-prefix sources must flag: $flagged/500")
    spark.stop()
  }
}
