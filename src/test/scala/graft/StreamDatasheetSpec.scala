package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Quality
import graft.streaming.StreamDatasheet

/** Streaming datasheet census: EXACT stream == batch on every prefix
  * (cross-batch duplicate twins included — dup exposure is global),
  * NULL folding parity, replay idempotency, empty batch, ledger
  * compaction under the negative-watermark contract, warm-up. */
class StreamDatasheetSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "lang", "text")

  // batch 2 plants a CROSS-SOURCE twin of doc 1 (dup exposure must
  // appear in BOTH sources only once the twin arrives) and flips web's
  // modal language; batch 3 carries the NULL-folding cases
  private val b1 = Seq(
    (1L, "web", "en", "the shared twin text"),
    (2L, "web", "en", "unique one"),
    (3L, "web", "de", "einzigartig"),
    (4L, "books", "en", "a long book text here"))
  private val b2 = Seq(
    (11L, "books", "en", "the shared twin text"),
    (12L, "web", "de", "noch eins"),
    (13L, "web", "de", "und noch eins"))
  private val b3: Seq[(Long, String, String, String)] = Seq(
    (21L, null, null, "orphan text"),
    (22L, "web", "en", null),
    (23L, "web", "en", null)) // two NULL texts must NOT count as dups

  private def batchSheet(rows: Seq[(Long, String, String, String)]) =
    Quality.datasheet(docs(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6)))).toMap

  private def streamSheet(volDir: String, hashDir: String) =
    StreamDatasheet.report(spark, volDir, hashDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6)))).toMap

  test("report over every prefix == batch datasheet; cross-batch dup, NULL folding") {
    val root = Files.createTempDirectory("sds").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String)]
    val q = StreamDatasheet.start(input.toDF()
        .toDF("doc_id", "source", "lang", "text"),
      s"$root/v", s"$root/h", s"$root/ck")
    try {
      var fed = Seq.empty[(Long, String, String, String)]
      for (b <- Seq(b1, b2, b3)) {
        input.addData(b: _*); q.processAllAvailable()
        fed = fed ++ b
        assert(streamSheet(s"$root/v", s"$root/h") == batchSheet(fed),
          s"prefix of ${fed.size} docs diverged")
      }
    } finally q.stop()
    val fin = streamSheet(s"$root/v", s"$root/h")
    // the twin arrived in batch 2: both sources carry dup exposure
    assert(fin("web")._4 > 0 && fin("books")._4 > 0)
    // web's modal language flipped to de at prefix 2 (3 de vs 2 en —
    // covered by the prefix equality loop) and back to en at prefix 3
    assert(fin("web")._5 == "en" && fin("web")._6 == 571428L)
    // NULL source folded to ''; NULL texts never look duplicated
    assert(fin.contains("") && fin("")._1 == 1L)
  }

  test("replayed batch rewrites identical partitions; empty batch is a no-op") {
    val root = Files.createTempDirectory("sds_r").toString
    StreamDatasheet.countBatch(docs(b1), 0L, s"$root/v", s"$root/h")
    StreamDatasheet.countBatch(docs(b2), 1L, s"$root/v", s"$root/h")
    val before = streamSheet(s"$root/v", s"$root/h")
    StreamDatasheet.countBatch(docs(b2), 1L, s"$root/v", s"$root/h") // replay
    assert(streamSheet(s"$root/v", s"$root/h") == before)
    assert(spark.read.parquet(s"$root/h").select("_batch")
      .distinct().count() == 2)
    StreamDatasheet.countBatch(docs(Seq.empty), 2L, s"$root/v", s"$root/h")
    assert(streamSheet(s"$root/v", s"$root/h") == before)
    assert(spark.read.parquet(s"$root/v").select("_batch")
      .distinct().count() == 2)
  }

  test("compaction folds both ledgers exactly; later batches keep landing") {
    val root = Files.createTempDirectory("sds_c").toString
    StreamDatasheet.countBatch(docs(b1), 0L, s"$root/v", s"$root/h")
    StreamDatasheet.countBatch(docs(b2), 1L, s"$root/v", s"$root/h")
    val before = streamSheet(s"$root/v", s"$root/h")
    StreamDatasheet.compact(spark, s"$root/v", s"$root/h", upTo = 1L)
    assert(streamSheet(s"$root/v", s"$root/h") == before,
      "compaction must not change the report")
    // both ledgers hold exactly the negative summary partition
    for (d <- Seq(s"$root/v", s"$root/h"))
      assert(spark.read.parquet(d).select("_batch").distinct()
        .collect().map(_.get(0).toString.toLong).toSet == Set(-1L))
    // post-compaction batches fold on top of the summary
    StreamDatasheet.countBatch(docs(b3), 2L, s"$root/v", s"$root/h")
    assert(streamSheet(s"$root/v", s"$root/h") ==
      batchSheet(b1 ++ b2 ++ b3))
  }

  test("warm-up: empty ledgers -> empty report, not an error") {
    val root = Files.createTempDirectory("sds_w").toString
    assert(StreamDatasheet.report(spark, s"$root/v", s"$root/h")
      .count() == 0)
  }
}
