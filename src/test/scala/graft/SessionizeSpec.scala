package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Sessionize => BatchSessionize}
import graft.streaming.{Sessionize => StreamSessionize}

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two sessions separated by 2h
    (1L, ts("2024-01-01 10:00:00"), 1L),
    (2L, ts("2024-01-01 10:20:00"), 1L),
    (3L, ts("2024-01-01 10:50:00"), 1L),
    (4L, ts("2024-01-01 13:00:00"), 1L),
    // user 2: single event
    (5L, ts("2024-01-01 09:00:00"), 2L)
  ).toDF("event_id", "ts", "user_id")

  test("batch sessions: gap splits, counts and bounds are exact") {
    val got = BatchSessionize.sessions(events, "user_id", "ts", gapMinutes = 60)
      .orderBy("user_id", "session_idx").collect()
    assert(got.length == 3)
    val s0 = got(0)
    assert(s0.getAs[Long]("user_id") == 1L && s0.getAs[Long]("n_events") == 3L)
    assert(s0.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(s0.getAs[Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
    assert(s0.getAs[Double]("duration_s") == 3000.0)
    val s1 = got(1)
    assert(s1.getAs[Long]("n_events") == 1L && s1.getAs[Timestamp]("session_start") == ts("2024-01-01 13:00:00"))
    assert(got(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming sessions == batch sessions once watermark closes everything") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val stream = StreamSessionize.sessions(
      input.toDF().toDF("event_id", "ts", "user_id"), gapMinutes = 60)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    try {
      input.addData(events.as[(Long, Timestamp, Long)].collect().toSeq: _*)
      q.processAllAvailable()
      // advance watermark far past every session end + gap
      input.addData((99L, ts("2024-01-02 12:00:00"), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess")
      .select("user_id", "session_start", "session_end", "n_events", "duration_s")
      .where($"user_id" =!= 9L)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toList
    val batch = BatchSessionize.sessions(events, "user_id", "ts", gapMinutes = 60)
      .select("user_id", "session_start", "session_end", "n_events", "duration_s")
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toList
    assert(streamed == batch)
  }

  test("transformWithState sessions == batch sessions (RocksDB state store)") {
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB provider; scope it to this
    // query and restore the session default afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp, Long)]
      val q = graft.streaming.SessionizeTws.sessions(
        input.toDF().toDF("event_id", "ts", "user_id"), gapMinutes = 60)
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_tws").start()
      try {
        input.addData(events.as[(Long, Timestamp, Long)].collect().toSeq: _*)
        q.processAllAvailable()
        // split batches: closes u1-session1 by gap AND u2 by timer later
        input.addData((99L, ts("2024-01-02 12:00:00"), 9L))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("sess_tws")
        .select("user_id", "session_start", "session_end", "n_events", "duration_s")
        .where($"user_id" =!= 9L)
        .orderBy("user_id", "session_start")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toList
      val batch = BatchSessionize.sessions(events, "user_id", "ts", gapMinutes = 60)
        .select("user_id", "session_start", "session_end", "n_events", "duration_s")
        .orderBy("user_id", "session_start")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toList
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming: session closes mid-stream when a later event exceeds the gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamSessionize.sessions(input.toDF().toDF("event_id", "ts", "user_id"), 60)
      .writeStream.outputMode("append").format("memory").queryName("sess2").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 12:30:00"), 1L)) // > 60m later: closes session 1
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess2").as[StreamSessionize.Session].collect()
    assert(rows.length == 1)
    assert(rows.head.n_events == 1L && rows.head.session_start == ts("2024-01-01 10:00:00"))
  }
}
