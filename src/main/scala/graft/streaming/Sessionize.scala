package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based streaming sessionization with custom state
  * (`flatMapGroupsWithState` + event-time timeout) — the stateful
  * streaming counterpart of the batch q23_sessionize query.
  *
  * Semantics: a session is a maximal run of a user's events where
  * consecutive gaps are <= `gapMinutes`. Within each micro-batch a
  * user's events are sorted and gap-split; closed sessions emit
  * immediately; the trailing open session is kept in state and emits
  * when the event-time watermark passes its end + gap (timeout), i.e.
  * no event can extend it any more.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** events must carry (user_id long, ts timestamp) and a watermark on
    * ts (required for EventTimeTimeout).
    */
  def sessions(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val gapMs = gapMinutes * 60000L
    implicit val eventEnc = Encoders.product[Event]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong

    events.select(col("user_id").cast("long"), col("ts")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // final when no event within gap can still arrive
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
