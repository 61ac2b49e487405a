package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamDomainCap

class StreamDomainCapSpec extends SparkTestBase {
  import spark.implicits._

  test("lifetime cap holds across micro-batches; small domains unaffected") {
    val outDir = Files.createTempDirectory("sdc_out").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sdc_led").toString + "/l"
    val ckpt = Files.createTempDirectory("sdc_ckpt").toString

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamDomainCap.start(
      input.toDF().toDF("doc_id", "source"), outDir, ledgerDir, ckpt, k = 3)
    try {
      // batch 0: 2 mega docs admitted (budget 3), small domain 1 doc
      input.addData((1L, "mega"), (2L, "mega"), (10L, "small"))
      q.processAllAvailable()
      // batch 1: mega has 1 budget left -> exactly one of 3/4/5 admitted
      input.addData((3L, "mega"), (4L, "mega"), (5L, "mega"), (11L, "small"))
      q.processAllAvailable()
      // batch 2: mega exhausted -> zero admitted
      input.addData((6L, "mega"), (12L, "small"))
      q.processAllAvailable()
    } finally q.stop()

    val adm = StreamDomainCap.admitted(spark, outDir)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val mega = adm.filter(_._2 == "mega").map(_._1)
    assert(mega.size == 3 && mega.contains(1L) && mega.contains(2L), adm.toString)
    assert((mega - 1L - 2L).subsetOf(Set(3L, 4L, 5L)), adm.toString)
    assert(adm.filter(_._2 == "small").map(_._1) == Set(10L, 11L, 12L), adm.toString)
    // ledger totals equal admitted counts
    val led = spark.read.parquet(ledgerDir).groupBy($"source")
      .agg(sum($"admitted").as("n")).as[(String, Long)].collect().toMap
    assert(led == Map("mega" -> 3L, "small" -> 3L), led.toString)
  }

  test("within-batch selection is the deterministic capPerDomain rank") {
    val outDir = Files.createTempDirectory("sdc_out2").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sdc_led2").toString + "/l"
    val b0 = (0L until 20L).map(i => (i, "d")).toDF("doc_id", "source")
    StreamDomainCap.capBatch(b0, 0L, outDir, ledgerDir, "source", "doc_id", k = 4)
    val got = StreamDomainCap.admitted(spark, outDir)
      .select("doc_id").as[Long].collect().toSet
    val expect = graft.ops.Curate.capPerDomain(b0, "source", "doc_id", k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expect, s"$got != $expect")
  }

  test("replayed micro-batch re-derives the identical admitted set") {
    val outDir = Files.createTempDirectory("sdc_out3").toString + "/o"
    val ledgerDir = Files.createTempDirectory("sdc_led3").toString + "/l"
    val b0 = Seq((1L, "m"), (2L, "m"), (3L, "m")).toDF("doc_id", "source")
    val b1 = Seq((4L, "m"), (5L, "m"), (6L, "m")).toDF("doc_id", "source")
    StreamDomainCap.capBatch(b0, 0L, outDir, ledgerDir, "source", "doc_id", k = 4)
    StreamDomainCap.capBatch(b1, 1L, outDir, ledgerDir, "source", "doc_id", k = 4)
    val first = StreamDomainCap.admitted(spark, outDir)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(first.size == 4, first.toString) // 3 from b0 + 1 from b1
    // replay batch 1: the `_batch < 1` ledger read hides its own prior
    // write, and dynamic overwrite rewrites the partition — same result
    StreamDomainCap.capBatch(b1, 1L, outDir, ledgerDir, "source", "doc_id", k = 4)
    val replayed = StreamDomainCap.admitted(spark, outDir)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(replayed == first, s"replay changed admissions: $replayed")
    val led = spark.read.parquet(ledgerDir)
      .groupBy($"source").agg(sum($"admitted").as("n"))
      .as[(String, Long)].collect().toMap
    assert(led == Map("m" -> 4L), led.toString)
  }
}
