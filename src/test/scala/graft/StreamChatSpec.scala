package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Chat
import graft.streaming.StreamChat

/** Streaming SFT gate: admitted corpus == batch flatten of the valid
  * transcripts, quarantine == the failed validate rows, replay
  * idempotency, empty-batch no-op. */
class StreamChatSpec extends SparkTestBase {
  import spark.implicits._

  private def toConv(rows: Seq[(Long, Seq[(String, String)])]): DataFrame =
    rows.toDF("doc_id", "_t")
      .select(col("doc_id"), expr(
        "transform(_t, x -> struct(x._1 as role, x._2 as content))").as("turns"))

  private val wave1 = Seq(
    1L -> Seq("user" -> "hi", "assistant" -> "hello"),          // clean
    2L -> Seq("assistant" -> "a", "user" -> "q"),               // bad opener + ending
    3L -> Seq("system" -> "s", "user" -> "q", "assistant" -> "a")) // clean
  private val wave2 = Seq(
    4L -> Seq("user" -> "q", "user" -> "q2", "assistant" -> "a"), // alternation
    5L -> Seq("user" -> "", "assistant" -> "a"),                  // empty turn
    6L -> Seq("user" -> "fine", "assistant" -> "sure"))           // clean

  test("stream == batch: corpus is flatten(valid); quarantine is the failures") {
    val root = Files.createTempDirectory("schat").toString
    implicit val ctx = spark.sqlContext
    val input2 = MemoryStream[(Long, Seq[(String, String)])]
    val conv = input2.toDF().toDF("doc_id", "_t")
      .select(col("doc_id"), expr(
        "transform(_t, x -> struct(x._1 as role, x._2 as content))").as("turns"))
    val q2 = StreamChat.start(conv, s"$root/c2", s"$root/q2", s"$root/ck2")
    try {
      input2.addData(wave1: _*); q2.processAllAvailable()
      input2.addData(wave2: _*); q2.processAllAvailable()
    } finally q2.stop()
    val all = toConv(wave1 ++ wave2)
    val expectCorpus = Chat.flatten(
      all.join(Chat.validate(all).where(col("ok")).select("doc_id"), Seq("doc_id")))
      .collect().map(r => (r.getLong(0), r.getAs[String]("rendered"))).toSet
    val gotCorpus = StreamChat.corpus(spark, s"$root/c2")
      .collect().map(r => (r.getLong(0), r.getAs[String]("rendered"))).toSet
    assert(gotCorpus == expectCorpus)
    assert(gotCorpus.map(_._1) == Set(1L, 3L, 6L))
    val gotQuarantine = StreamChat.quarantine(spark, s"$root/q2")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(gotQuarantine.keySet == Set(2L, 4L, 5L))
    assert(gotQuarantine(2L) == ((false, true, true, false))) // opener + ending
    assert(gotQuarantine(4L) == ((true, false, true, true)))  // alternation
    assert(gotQuarantine(5L) == ((true, true, false, true)))  // empty turn
  }

  test("replayed batch rewrites identical partitions; outputs unchanged") {
    val root = Files.createTempDirectory("schat_r").toString
    StreamChat.gateBatch(toConv(wave1), 0L, s"$root/c", s"$root/q")
    StreamChat.gateBatch(toConv(wave2), 1L, s"$root/c", s"$root/q")
    def state() = (
      StreamChat.corpus(spark, s"$root/c").collect()
        .map(r => (r.getLong(0), r.getAs[String]("rendered"))).toSet,
      StreamChat.quarantine(spark, s"$root/q").collect()
        .map(_.getLong(0)).toSet)
    val before = state()
    StreamChat.gateBatch(toConv(wave2), 1L, s"$root/c", s"$root/q") // replay
    assert(state() == before)
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 2)
  }

  test("zero-turn and NULL-turns transcripts land in quarantine, not limbo") {
    val root = Files.createTempDirectory("schat_z").toString
    val base = toConv(Seq(
      7L -> Seq.empty[(String, String)],
      8L -> Seq("user" -> "q", "assistant" -> "a")))
    val withNull = base.unionByName(
      Seq(9L).toDF("doc_id").select(col("doc_id"),
        lit(null).cast(base.schema("turns").dataType).as("turns")))
    StreamChat.gateBatch(withNull, 0L, s"$root/c", s"$root/q")
    assert(StreamChat.corpus(spark, s"$root/c").collect()
      .map(_.getLong(0)).toSet == Set(8L))
    val quar = StreamChat.quarantine(spark, s"$root/q").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    // the gate's contract: every input id is in exactly one side —
    // the most malformed transcripts must not vanish (round-11 advice)
    assert(quar.keySet == Set(7L, 9L))
    assert(quar.values.toSet == Set((false, false, false, false)))
  }

  test("empty batch: no partitions written") {
    val root = Files.createTempDirectory("schat_e").toString
    StreamChat.gateBatch(toConv(wave1), 0L, s"$root/c", s"$root/q")
    StreamChat.gateBatch(toConv(wave1).where(col("doc_id") < 0), 1L,
      s"$root/c", s"$root/q")
    assert(spark.read.parquet(s"$root/c").select("_batch").distinct().count() == 1)
  }
}
