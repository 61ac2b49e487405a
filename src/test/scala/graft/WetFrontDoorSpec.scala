package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, Quality, Web}
import graft.sources.Warc
import graft.streaming.{StreamDatasheet, StreamGovernance}

/** The crawl FRONT DOOR as a resident: WET files land on disk,
  * [[Warc.streamWet]] explodes them file-grained into document rows,
  * and the governance sweep / datasheet census residents consume the
  * stream — no parquet staging anywhere. Pins that (a) the streaming
  * WET source composes with the foreachBatch residents, (b) resident
  * verdicts equal the batch sweep over the batch WET read, and (c) a
  * corrupt WET file dropped into the watch directory contributes zero
  * rows without poisoning the stream. */
class WetFrontDoorSpec extends SparkTestBase {
  import spark.implicits._

  // hosts: a.example.com opted out by registry; b.example.com robots-
  // blocks /private for graftbot; c.example.com clean
  private val docs = Seq(
    (1L, "http://a.example.com/x",
      "some perfectly readable plain text here. it reads well."),
    (2L, "http://b.example.com/private/p",
      "some perfectly readable plain text here. it reads well."),
    (3L, "http://b.example.com/open/p",
      "some perfectly readable plain text here. it reads well."),
    (4L, "http://c.example.com/ok",
      "some perfectly readable plain text here. it reads well."))

  private def writeWetDir(): String = {
    val wetDir = Files.createTempDirectory("wfd").toString
    Warc.writeWet(docs.map { case (i, u, t) =>
      (i, u, "2026-01-01T00:00:00Z", t) }
      .toDF("doc_id", "uri", "date", "text"), wetDir, perFile = 2)
    wetDir
  }

  test("streamWet -> StreamGovernance(robots): resident verdicts equal the batch sweep; corrupt file inert") {
    val wetDir = writeWetDir()
    // a corrupt file alongside: must contribute zero rows, not poison
    val good = new java.io.File(wetDir).listFiles()
      .filter(_.getName.endsWith(".gz")).head
    val corrupt = Files.readAllBytes(good.toPath)
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x20).toByte
    Files.write(new java.io.File(wetDir, "wet-00099.warc.wet.gz").toPath,
      corrupt)
    val out = Files.createTempDirectory("wfd_out").toString
    Seq("a.example.com").toDF("domain")
      .write.parquet(s"$out/reg")
    Seq(("b.example.com", "User-agent: *\nDisallow: /private"))
      .toDF("host", "text").write.parquet(s"$out/rob")
    val stream = Warc.streamWet(spark, s"$wetDir/*.warc.wet.gz",
        maxFilesPerTrigger = 1)
      .select(col("record_id"), col("target_uri").as("url"), col("text"))
    val q = StreamGovernance.start(stream, s"$out/reg", s"$out/c",
      s"$out/q", s"$out/ck", idCol = "record_id",
      robotsDir = Some(s"$out/rob"))
    q.processAllAvailable(); q.stop()
    val streamed =
      (StreamGovernance.corpus(spark, s"$out/c")
        .select(col("record_id"), col("verdict")).collect() ++
       StreamGovernance.quarantine(spark, s"$out/q")
        .select(col("record_id"), col("verdict")).collect())
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batchRead = Warc.readWet(spark, s"$wetDir/*.warc.wet.gz")
    val direct = Pipeline.governanceSweep(
        batchRead.select(col("record_id"), col("target_uri").as("url"),
          col("text")),
        Seq("a.example.com").toDF("domain"), idCol = "record_id",
        robotsRules = Some(Web.robotsRules(
          Seq(("b.example.com", "User-agent: *\nDisallow: /private"))
            .toDF("host", "text"))))
      .select(col("record_id"), col("verdict")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == direct, "resident verdicts must equal the batch sweep")
    // the planted outcomes, keyed back through the uri
    val byUri = batchRead.select(col("target_uri"), col("record_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed(byUri("http://a.example.com/x")) == "opted_out")
    assert(streamed(byUri("http://b.example.com/private/p")) ==
      "robots_blocked")
    assert(streamed(byUri("http://b.example.com/open/p")) == "keep")
    assert(streamed(byUri("http://c.example.com/ok")) == "keep")
    // the corrupt file contributed nothing: 4 verdicts, not 6
    assert(streamed.size == 4)
  }

  test("streamWet -> StreamNearDedup: a cross-file near-dup collapses to one survivor") {
    import graft.streaming.StreamNearDedup
    val base = (1 to 30).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 30).map(i =>
      if (i == 15) "CHANGED" else s"word$i").mkString(" ")
    val wetDir = Files.createTempDirectory("wfd3").toString
    // perFile=10 -> ids 1,2 land in wet-00000, ids 11,12 in wet-00001;
    // maxFilesPerTrigger=1 makes the near-dup pair CROSS-batch
    Warc.writeWet(Seq(
      (1L, "http://x.com/1", "2026-01-01T00:00:00Z", base),
      (2L, "http://x.com/2", "2026-01-01T00:00:00Z",
        (1 to 30).map(i => s"other$i").mkString(" ")),
      (11L, "http://x.com/11", "2026-01-01T00:00:00Z", nearDup),
      (12L, "http://x.com/12", "2026-01-01T00:00:00Z",
        (1 to 30).map(i => s"fresh$i").mkString(" ")))
      .toDF("doc_id", "uri", "date", "text"), wetDir, perFile = 10)
    val out = Files.createTempDirectory("wfd3_out").toString
    val q = StreamNearDedup.start(
      Warc.streamWet(spark, s"$wetDir/*.warc.wet.gz", maxFilesPerTrigger = 1)
        .select(col("target_uri").as("doc_id"), col("text")),
      s"$out/c", s"$out/i", s"$out/ck")
    q.processAllAvailable(); q.stop()
    val survivors = StreamNearDedup.corpus(spark, s"$out/c")
      .select(col("doc_id")).collect().map(_.getString(0)).toSet
    // exactly ONE of the near-dup pair survives (file processing order
    // is mtime-dependent, so pin the class, not the id); the two
    // distinct docs always survive
    assert(survivors.count(Set("http://x.com/1", "http://x.com/11")) == 1,
      s"near-dup pair must collapse to one survivor, got $survivors")
    assert(survivors("http://x.com/2") && survivors("http://x.com/12"))
    assert(survivors.size == 3)
  }

  test("streamWet -> StreamDatasheet: the ledgered census equals the batch datasheet") {
    val wetDir = writeWetDir()
    val out = Files.createTempDirectory("wfd2_out").toString
    def asDocs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("record_id").as("doc_id"),
        Web.urlHost(col("target_uri")).as("source"),
        lit("en").as("lang"), col("text"))
    val q = StreamDatasheet.start(
      asDocs(Warc.streamWet(spark, s"$wetDir/*.warc.wet.gz",
        maxFilesPerTrigger = 1)),
      s"$out/vol", s"$out/hash", s"$out/ck")
    q.processAllAvailable(); q.stop()
    val streamed = StreamDatasheet.report(spark, s"$out/vol", s"$out/hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getString(5))).toSet
    val direct = Quality.datasheet(
      asDocs(Warc.readWet(spark, s"$wetDir/*.warc.wet.gz")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getString(5))).toSet
    assert(streamed == direct)
    assert(streamed.map(_._1) ==
      Set("a.example.com", "b.example.com", "c.example.com"))
    // the four identical texts are exact duplicates across SOURCES:
    // every host's census shows full dup exposure (the global-df rule)
    assert(streamed.forall(_._4 == 1000000L))
  }
}
