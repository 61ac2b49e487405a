package graft

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Analytics
import graft.streaming.StreamBot

/** Streaming bot gate: per-prefix stream == batch on a planted fixture
  * (timer bots vs organic jitter, cross-batch boundary gaps), the
  * zero-gap degenerate, and the honest saturation verdict. */
class StreamBotSpec extends SparkTestBase {
  import spark.implicits._

  private val base = 1700000000000000L // µs

  private def ev(id: Long, user: Long, offsetS: Double): (Long, Timestamp, Long) =
    (id, new Timestamp((base + (offsetS * 1e6).toLong) / 1000), user)

  // fixture: user 2 = exact 60 s timer bot; user 5 = organic jitter;
  // user 7 = regular but too few events; user 9 = sub-second hammer
  // (all gaps floor to 0 s)
  private val fixture: Seq[(Long, Timestamp, Long)] = {
    var id = 0L
    def next(): Long = { id += 1; id }
    val bot = (0 until 12).map(i => ev(next(), 2L, i * 60.0))
    val organic = Seq(0.0, 7.0, 11.0, 40.0, 41.5, 95.0, 96.0, 180.0,
      290.0, 291.0, 430.0, 431.0).map(o => ev(next(), 5L, o))
    val few = (0 until 3).map(i => ev(next(), 7L, i * 30.0))
    val hammer = (0 until 12).map(i => ev(next(), 9L, i * 0.4))
    bot ++ organic ++ few ++ hammer
  }

  private def batchVerdicts(rows: Seq[(Long, Timestamp, Long)]) =
    Analytics.timingRegularity(rows.toDF("event_id", "ts", "user_id"))
      .select("user_id", "n_gaps", "mean_gap_s", "mad_ppm", "bot_like")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("per-prefix stream == batch; boundary gaps cross batches; latest verdict wins") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Long)]
      val emitted = ArrayBuffer.empty[(Long, StreamBot.Verdict)]
      val ckpt = java.nio.file.Files.createTempDirectory("sbot_ckpt").toString
      val q = StreamBot.verdicts(input.toDF().toDF("event_id", "ts", "user_id"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: Dataset[StreamBot.Verdict], bid: Long) =>
          val rows = ds.collect()
          emitted.synchronized { emitted ++= rows.map(bid -> _) }
          ()
        }
        .start()
      try {
        // three time-ordered cuts; every user's event run crosses both
        // boundaries, so boundary gaps exercise the Last state
        val byTime = fixture.sortBy(_._2.getTime)
        val cuts = Seq(byTime.take(15), byTime.slice(15, 30), byTime.drop(30))
        var fed = Seq.empty[(Long, Timestamp, Long)]
        for (chunk <- cuts) {
          input.addData(chunk: _*)
          q.processAllAvailable()
          fed = fed ++ chunk
          val expect = batchVerdicts(fed)
          // latest emission per user == batch operator on the prefix
          val latest = emitted.synchronized {
            emitted.groupBy(_._2.user_id).map { case (u, rows) =>
              u -> rows.maxBy(_._1)._2
            }
          }
          for ((u, v) <- latest) {
            assert(!v.saturated)
            assert(expect(u) == ((v.n_gaps, v.mean_gap_s, v.mad_ppm, v.bot_like)),
              s"user $u after ${fed.size} events: stream $v vs batch ${expect(u)}")
          }
          // and every batch-visible user with >= 1 gap has been emitted
          assert(expect.keySet == latest.keySet)
        }
      } finally q.stop()
      // final verdicts: the planted classes separate
      val finalV = emitted.groupBy(_._2.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._1)._2 }
      assert(finalV(2L).bot_like, "timer bot must flag")
      assert(!finalV(5L).bot_like, "organic user must not flag")
      assert(!finalV(7L).bot_like, "too-few-events user must not flag")
      assert(finalV(9L).bot_like && finalV(9L).mean_gap_s == 0L,
        "sub-second hammer floors to 0-gap and flags")
    }
  }

  test("saturation: distinct-gap cap emits the honest organic verdict") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Long)]
      val emitted = ArrayBuffer.empty[StreamBot.Verdict]
      val ckpt = java.nio.file.Files.createTempDirectory("sbot_ckpt2").toString
      // 8 distinct gaps (1,2,..,8 s) against a cap of 4
      val rows = (0 until 9).scanLeft(0.0)((acc, i) => acc + i + 1).zipWithIndex
        .map { case (off, i) => ev(100L + i, 1L, off) }
      val q = StreamBot.verdicts(
        input.toDF().toDF("event_id", "ts", "user_id"), maxDistinctGaps = 4L)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: Dataset[StreamBot.Verdict], _: Long) =>
          val r = ds.collect()
          emitted.synchronized { emitted ++= r }
          ()
        }
        .start()
      try {
        input.addData(rows: _*)
        q.processAllAvailable()
      } finally q.stop()
      val v = emitted.last
      assert(v.saturated && !v.bot_like && v.mad_ppm == -1L)
      assert(v.n_gaps == rows.size - 1L, "totals keep counting past the cap")
    }
  }
}
