package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.LinkGraph
import graft.streaming.StreamOutlinks

/** Streaming outlink harvest: edge ledger == the batch extraction on
  * any prefix, the folded host rank matches the batch rank, replay
  * idempotency via the `_batch` ledger, empty-batch no-op. */
class StreamOutlinksSpec extends SparkTestBase {
  import spark.implicits._

  private val wave1 = Seq(
    (1L, "https://a.com/p/1",
      """<a href="https://b.com/x">1</a><a href="/p/2#s">2</a>"""),
    (2L, "https://b.com/q/1", """<a href="../r">u</a>"""))
  private val wave2 = Seq(
    (3L, "https://c.com/z",
      """<a href="//b.com/y?utm_source=t&k=1">p</a><a href="mailto:m@x">m</a>"""))

  private def pages(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "url", "html")

  private def edgeSet(df: DataFrame): Set[(Long, String, String, String, Boolean)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src_host"),
      r.getAs[String]("dst_url"), r.getAs[String]("dst_host"),
      r.getAs[Boolean]("internal"))).toSet

  test("stream == batch on any prefix; folded rank == batch rank") {
    val root = Files.createTempDirectory("solk").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOutlinks.start(
      input.toDF().toDF("doc_id", "url", "html"),
      s"$root/links", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      // prefix equality after wave 1
      assert(edgeSet(StreamOutlinks.links(spark, s"$root/links")) ==
        edgeSet(LinkGraph.outlinks(pages(wave1))))
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamOutlinks.links(spark, s"$root/links")
    assert(edgeSet(streamed) == edgeSet(LinkGraph.outlinks(pages(wave1 ++ wave2))))
    // canonicalization inside the resident: the tracking param is gone
    assert(edgeSet(streamed).exists(_._3 == "https://b.com/y?k=1"))

    val foldRank = StreamOutlinks.hostRank(spark, s"$root/links")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchRank = LinkGraph.hostRank(LinkGraph.outlinks(pages(wave1 ++ wave2)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(foldRank == batchRank && foldRank.contains("b.com"))
  }

  test("replay idempotency: re-running a batch rewrites its own partition") {
    val root = Files.createTempDirectory("solk2").toString
    StreamOutlinks.harvestBatch(pages(wave1), 0L, s"$root/links")
    StreamOutlinks.harvestBatch(pages(wave2), 1L, s"$root/links")
    val once = edgeSet(StreamOutlinks.links(spark, s"$root/links"))
    StreamOutlinks.harvestBatch(pages(wave2), 1L, s"$root/links") // replay
    assert(edgeSet(StreamOutlinks.links(spark, s"$root/links")) == once)
  }

  test("empty batch is a no-op (no ledger partition written)") {
    val root = Files.createTempDirectory("solk3").toString
    StreamOutlinks.harvestBatch(pages(wave1), 0L, s"$root/links")
    StreamOutlinks.harvestBatch(pages(wave1).limit(0), 1L, s"$root/links")
    val batches = spark.read.parquet(s"$root/links")
      .select("_batch").distinct().as[Long].collect().toSet
    assert(batches == Set(0L))
  }
}
