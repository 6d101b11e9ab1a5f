package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an unbounded stream with
  * flatMapGroupsWithState — the custom-state extension point for
  * semantics windowed aggregation can't express (a session has no fixed
  * window; it closes when the user goes quiet).
  *
  * State is one (start, last, count) triple per user — O(active users),
  * independent of stream length. Sessions close either when a later
  * event arrives beyond the gap (emitted in that batch) or when the
  * event-time watermark passes last+gap (timeout path). The batch
  * equivalent is the ev_session query; StreamSessionSpec ties the two
  * together on the same topic.
  */
object Sessionize {

  /** ts stays TimestampType so the caller's withWatermark survives into
    * the stateful operator (the event-time timeout requires it)
    */
  case class Event(userId: Long, ts: java.sql.Timestamp) {
    def tsMs: Long = ts.getTime
  }
  case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)
  /** per-user state (public: the state encoder's generated code needs
    * accessor visibility)
    */
  case class St(start: Long, last: Long, n: Long)

  /** events must already carry a watermark (the caller knows its lateness
    * bound); gapMs is the inactivity gap that closes a session.
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[St, Session](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[St]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.start, st.last, st.n))
          } else {
            val closed = Seq.newBuilder[Session]
            var st = state.getOption.orNull
            batch.toSeq.sortBy(e => e.tsMs).foreach { e =>
              st match {
                case null =>
                  st = St(e.tsMs, e.tsMs, 1)
                case s if e.tsMs - s.last > gapMs =>
                  closed += Session(userId, s.start, s.last, s.n)
                  st = St(e.tsMs, e.tsMs, 1)
                case s =>
                  st = St(s.start, math.max(s.last, e.tsMs), s.n + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
