package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Chat
import graft.streaming.StreamPref

/** Streaming preference-pair gate: admitted corpus == the valid raw
  * pairs, quarantine == the failed preferencePairs rows (NULL-sided
  * pairs included), replay idempotency, empty-batch no-op. */
class StreamPrefSpec extends SparkTestBase {
  import spark.implicits._

  private def toPairs(rows: Seq[(Long, Seq[(String, String)], Seq[(String, String)])]): DataFrame =
    rows.toDF("pair_id", "_c", "_r").select(col("pair_id"),
      expr("transform(_c, x -> struct(x._1 as role, x._2 as content))").as("chosen"),
      expr("transform(_r, x -> struct(x._1 as role, x._2 as content))").as("rejected"))

  private val wave1 = Seq(
    (1L, Seq("user" -> "q", "assistant" -> "a long answer"),
         Seq("user" -> "q", "assistant" -> "a short")),          // clean
    (2L, Seq("user" -> "q", "assistant" -> "same"),
         Seq("user" -> "q", "assistant" -> "same")),             // tie
    (3L, Seq("user" -> "q", "assistant" -> "yes"),
         Seq("user" -> "q!", "assistant" -> "no")))              // prefix mutated
  private val wave2 = Seq(
    (4L, Seq("user" -> "q", "user" -> "again"),
         Seq("user" -> "q", "user" -> "later")),                 // no assistant ending
    (5L, Seq("user" -> "q", "assistant" -> "fine"),
         null.asInstanceOf[Seq[(String, String)]]),              // NULL side
    (6L, Seq("system" -> "s", "user" -> "q", "assistant" -> "sure"),
         Seq("system" -> "s", "user" -> "q", "assistant" -> "nope"))) // clean

  test("stream == batch: corpus is the valid raw pairs; quarantine is the failures") {
    val root = Files.createTempDirectory("spref").toString
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[(String, String)], Seq[(String, String)])]
    val pairs = input.toDF().toDF("pair_id", "_c", "_r")
      .select(col("pair_id"),
        expr("transform(_c, x -> struct(x._1 as role, x._2 as content))").as("chosen"),
        expr("transform(_r, x -> struct(x._1 as role, x._2 as content))").as("rejected"))
    val q = StreamPref.start(pairs, s"$root/c", s"$root/q", s"$root/ck")
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val all = toPairs(wave1 ++ wave2)
    val batchVerdicts = Chat.preferencePairs(all).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(6)))).toMap
    val gotCorpus = StreamPref.corpus(spark, s"$root/c").collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).length)).toMap
    assert(gotCorpus.keySet == Set(1L, 6L))
    assert(gotCorpus(1L) == 2 && gotCorpus(6L) == 3, "raw turns preserved")
    val gotQuar = StreamPref.quarantine(spark, s"$root/q").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(6)))).toMap
    // every input id lands in exactly one side; flags match the batch run
    assert(gotQuar.keySet == Set(2L, 3L, 4L, 5L))
    gotQuar.foreach { case (id, flags) => assert(flags == batchVerdicts(id)) }
    assert(gotQuar(2L)._3 == false)  // tie: divergent_ok fails
    assert(gotQuar(3L)._1 == false)  // prefix mutation
    assert(gotQuar(4L)._2 == false)  // no assistant ending
    assert(gotQuar(5L)._1 == false)  // NULL side reads as plain failure
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("spref_r").toString
    StreamPref.gateBatch(toPairs(wave1), 0L, s"$root/c", s"$root/q")
    StreamPref.gateBatch(toPairs(wave2), 1L, s"$root/c", s"$root/q")
    def state() = (
      StreamPref.corpus(spark, s"$root/c").collect().map(_.getLong(0)).toSet,
      StreamPref.quarantine(spark, s"$root/q").collect()
        .map(r => (r.getLong(0), r.getBoolean(6))).toSet)
    val before = state()
    StreamPref.gateBatch(toPairs(wave2), 1L, s"$root/c", s"$root/q") // replay
    assert(state() == before)
    assert(spark.read.parquet(s"$root/q").select("_batch").distinct().count() == 2)
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("spref_e").toString
    StreamPref.gateBatch(toPairs(wave1), 0L, s"$root/c", s"$root/q")
    StreamPref.gateBatch(toPairs(wave1).where(col("pair_id") < 0), 1L,
      s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
