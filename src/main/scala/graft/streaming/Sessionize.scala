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
  /** start/end are epoch MICROSECONDS: `Timestamp.getTime` is
    * millisecond-truncated, and a session boundary emitted at ms
    * precision would not equal the batch gap-split over
    * microsecond-precision event time (the m38 boundary gate's claim).
    */
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** events must carry (user_id long, ts timestamp) and a watermark on
    * ts (required for EventTimeTimeout).
    *
    * Out-of-order handling: within one invocation the open state
    * session and the micro-batch's events merge as SEGMENTS sorted by
    * start time, so a watermark-admitted event that arrives in a LATER
    * micro-batch but precedes the open session is handled with batch
    * gap-split semantics — within `gap` of the session's span it joins
    * it and EXTENDS `session_start` backward; more than `gap` before it
    * forms (and immediately closes) its own earlier session. The
    * inherent streaming limit remains: an event late enough that its
    * true session was already emitted (closed by a later same-user
    * event in a previous batch, or timed out past the watermark) cannot
    * reopen it — bound that window with the watermark delay.
    */
  def sessions(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val gapUs = gapMinutes * 60000000L
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
            Iterator.single(Session(user, toTs(s.start), toTs(s.end), s.n))
          } else {
            // segments: the open session span plus one point-segment per
            // event, merged in start order — identical to the batch
            // gap-split over the union of state and batch events
            val segs = (state.getOption.map(s => (s.start, s.end, s.n)).toList
              ++ it.map { e => val t = toUs(e.ts); (t, t, 1L) }.toList)
              .sortBy(s => (s._1, s._2))
            var closed = List.empty[Session]
            var cur: Option[(Long, Long, Long)] = None
            segs.foreach { case (s0, e0, n0) =>
              cur match {
                case Some((cs, ce, cn)) if s0 - ce <= gapUs =>
                  cur = Some((cs, math.max(ce, e0), cn + n0))
                case Some((cs, ce, cn)) =>
                  closed ::= Session(user, toTs(cs), toTs(ce), cn)
                  cur = Some((s0, e0, n0))
                case None =>
                  cur = Some((s0, e0, n0))
              }
            }
            cur.foreach { case (cs, ce, cn) =>
              state.update(SessionState(cs, ce, cn))
              // final when no event within gap can still arrive; ce only
              // ever grows, so the timeout never moves below the
              // watermark (ceil to ms so it cannot fire a hair early)
              state.setTimeoutTimestamp(
                Math.floorDiv(ce + gapUs + 999L, 1000L))
            }
            closed.reverseIterator
          }
      }
  }
}
