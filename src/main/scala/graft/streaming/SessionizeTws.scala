package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Sessionization on the `transformWithState` arbitrary-state API (the
  * Spark 4 successor of flatMapGroupsWithState — SPARK-40434): typed named
  * state slots, explicit timers, and RocksDB-backed state with changelog
  * checkpointing, which is the shape that scales streaming state past
  * executor memory (state lives off-heap/on-disk, checkpoints ship only
  * changelogs).
  *
  * Semantics are IDENTICAL to streaming.Sessionize (flatMapGroupsWithState)
  * and ops.Sessionize.sessions (batch lag/cumsum) — the spec asserts all
  * three agree: a session closes when a newer event for its key arrives
  * more than `gapMinutes` later, or when the watermark passes
  * session_end + gap (timer). State per key: one open session (four
  * longs) in a ValueState, constant regardless of session length.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does not run
  * on the default HDFS-backed store.
  */
object SessionizeTws {

  /** Open-session state: bounds + count + the registered timer (timers are
    * not replaced implicitly, so we must delete the stale one by value). */
  case class Open(startUs: Long, endUs: Long, n: Long, timerMs: Long)

  class Processor(gapMinutes: Int)
      extends StatefulProcessor[Long, Sessionize.Event, Sessionize.Session] {
    private val gapUs = gapMinutes * 60L * 1000000L
    private val gapMs = gapMinutes * 60L * 1000L
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open", Encoders.product[Open], TTLConfig.NONE)

    private def emit(key: Long, s: Open): Sessionize.Session =
      Sessionize.Session(key,
        new java.sql.Timestamp(s.startUs / 1000), new java.sql.Timestamp(s.endUs / 1000),
        s.n, (s.endUs - s.startUs) / 1e6)

    override def handleInputRows(key: Long, rows: Iterator[Sessionize.Event],
                                 timers: TimerValues): Iterator[Sessionize.Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
      var cur = if (open.exists()) Some(open.get()) else None
      val closed = Seq.newBuilder[Sessionize.Session]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000
        cur match {
          case Some(s) if us - s.endUs > gapUs =>
            closed += emit(key, s)
            cur = Some(Open(us, us, 1, s.timerMs))
          case Some(s) =>
            cur = Some(Open(s.startUs, math.max(s.endUs, us), s.n + 1, s.timerMs))
          case None =>
            cur = Some(Open(us, us, 1, -1L))
        }
      }
      cur.foreach { s =>
        if (s.timerMs >= 0) getHandle.deleteTimer(s.timerMs)
        val t = s.endUs / 1000 + gapMs
        getHandle.registerTimer(t)
        open.update(Open(s.startUs, s.endUs, s.n, t))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Sessionize.Session] = {
      // stale timers are deleted on update, so a firing timer always
      // matches the current open session: close it
      if (open.exists()) {
        val out = emit(key, open.get())
        open.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  def sessions(events: DataFrame, gapMinutes: Int = 30,
               watermark: String = "10 minutes"): Dataset[Sessionize.Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[Sessionize.Event]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[Sessionize.Session])
  }
}
