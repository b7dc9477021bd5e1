package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState (SURVEY §2.12 scale
  * extras): per-user session tracking with an explicit gap timeout —
  * the arbitrary-state counterpart of the declarative
  * `session_window` aggregation in [[EventWindows]]. Emits one record per
  * CLOSED session (on gap timeout), exactly-once per session.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  val gapMillis: Long = 30L * 60 * 1000

  def update(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ClosedSession(userId, new Timestamp(s.start),
        new Timestamp(s.lastSeen), s.nEvents))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen < gapMillis =>
            cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
              nEvents = s.nEvents + 1))
          case Some(s) =>
            closed ::= ClosedSession(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastSeen + gapMillis)
      }
      closed.reverseIterator
    }
  }

  /** Wire the stateful sessionizer over a (possibly streaming) event
    * Dataset. Event-time timeout requires a watermark on `ts` upstream.
    */
  def sessionize(events: Dataset[Event]): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
