package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit keyed state — the one operator
  * family the reference's Redis-TTL trick gestured at but Spark expresses
  * natively: `flatMapGroupsWithState` + event-time timeout.
  *
  * Semantics match ops.Sessionize.sessions (the batch lag/cumsum form;
  * StreamingSpec asserts equality): a session closes when a newer event
  * for the key arrives more than `gapMinutes` later, or when the watermark
  * passes session_end + gap (timeout) — so state is bounded and sessions
  * still close for keys that simply stop sending. State per key is one
  * open session (three longs), independent of session length — the shape
  * that survives 10^9 keys on a cluster.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp)
  case class OpenSession(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                     n_events: Long, duration_s: Double)

  private def toSession(key: Long, s: OpenSession): Session =
    Session(key, new Timestamp(s.startUs / 1000), new Timestamp(s.endUs / 1000),
      s.n, (s.endUs - s.startUs) / 1e6)

  def sessions(events: DataFrame, gapMinutes: Int = 30,
               watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(key: Long, rows: Iterator[Event],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val closed = state.getOption.map(toSession(key, _)).iterator
        state.remove()
        return closed
      }
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000 + e.ts.getNanos / 1000 % 1000
        open match {
          case Some(s) if us - s.endUs > gapUs =>
            closed += toSession(key, s)
            open = Some(OpenSession(us, us, 1))
          case Some(s) =>
            open = Some(OpenSession(s.startUs, math.max(s.endUs, us), s.n + 1))
          case None =>
            open = Some(OpenSession(us, us, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close via timeout once the watermark passes end + gap
        state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60L * 1000)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
