package graft

import java.time.Duration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.LeaderboardTws

/** Test-harness note: with TimeMode.ProcessingTime (required for state
  * TTL) the engine schedules micro-batches CONTINUOUSLY to advance the
  * clock — `processAllAvailable` never quiesces and Trigger.AvailableNow
  * never self-terminates (both verified: the query kept committing empty
  * batches until interrupted). Empty batches touch no keys and therefore
  * emit no rows in Update mode, so the sink row count is a clean signal:
  * poll the memory table for the expected rows, then stop the query. */
class LeaderboardTwsSpec extends SparkTestBase {
  import spark.implicits._

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def pollUntil(cond: => Boolean, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(cond, "condition not reached within timeout")
  }

  test("counts accumulate across micro-batches while keys stay warm") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[String]
      val q = LeaderboardTws.counts(input.toDF().toDF("k"), "k", Duration.ofHours(1))
        .writeStream.outputMode("update").format("memory")
        .queryName("lb_tws").start()
      try {
        input.addData("a", "a", "b")
        pollUntil(spark.table("lb_tws").count() >= 2)
        input.addData("a", "b", "b", "c")
        pollUntil(spark.table("lb_tws").count() >= 5)
      } finally q.stop()
      val latest = spark.table("lb_tws").groupBy("key")
        .agg(max("cnt").as("cnt"))
        .as[(String, Long)].collect().toMap
      assert(latest == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    }
  }

  test("cold keys age out: counter restarts after the TTL passes") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[String]
      val q = LeaderboardTws.counts(input.toDF().toDF("k"), "k", Duration.ofSeconds(1))
        .writeStream.outputMode("update").format("memory")
        .queryName("lb_tws_ttl").start()
      try {
        input.addData("x", "x", "x", "x", "x")
        pollUntil(spark.table("lb_tws_ttl").count() >= 1)
        Thread.sleep(2500) // > TTL; the clock advances via empty batches
        input.addData("x", "x", "x")
        pollUntil(spark.table("lb_tws_ttl").count() >= 2)
      } finally q.stop()
      val emitted = spark.table("lb_tws_ttl").select("cnt")
        .as[Long].collect().toSeq.sorted
      // first batch emitted 5; post-expiry batch emitted 3 (NOT 8)
      assert(emitted == Seq(3L, 5L), s"got $emitted")
    }
  }

  test("topKView: latest count per key wins, ordered desc, ties by key") {
    // emission log across three micro-batches: counts only grow per key,
    // later seq supersedes earlier (Update-mode semantics)
    val log = Seq(
      (0L, "a", 5L), (0L, "b", 3L),
      (1L, "a", 9L), (1L, "c", 7L),
      (2L, "b", 9L), (2L, "d", 1L)).toDF("seq", "key", "cnt")
    val got = graft.streaming.LeaderboardTws.topKView(log, k = 3)
      .as[(String, Long)].collect().toList
    // latest per key: a=9, b=9, c=7, d=1 -> top-3 with a before b on tie
    assert(got == List(("a", 9L), ("b", 9L), ("c", 7L)), s"got $got")
  }
}
