package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-touch gate — ev_first_touch's streaming twin: each
  * user's acquisition channel (the type of their FIRST event in the
  * deterministic (ts, event_id) order) and whether they have purchased
  * yet, maintained online so an acquisition dashboard reads
  * channel-conversion AS SIGNUPS HAPPEN instead of waiting for the
  * nightly batch table.
  *
  * Why this is the right streaming shape: the per-user state is a
  * CONSTANT-SIZE tuple (earliest-seen event + a purchased bit) — O(users)
  * total, no timeout needed — and both components are order-independent
  * merges: the first event is the (ts_us, event_id)-minimum (idempotent,
  * commutative), the purchased flag a monotone OR. Any partition of the
  * stream into micro-batches therefore drains to the same final state as
  * one batch pass, which is exactly what StreamFirstTouchSpec proves
  * against batch ev_first_touch.
  */
object FirstTouchStream {
  case class Ev(user_id: Long, event_type: String, ts_us: Long, event_id: Long)
  /** per-user emission after a micro-batch: events seen so far, the
    * current first-touch type and the purchased bit
    */
  case class Touch(user_id: Long, n: Long, first_type: String, purchased: Boolean)
  case class St(n: Long, first_type: String, ts_us: Long, event_id: Long, purchased: Boolean)

  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select($"user_id", $"event_type",
      unix_micros($"ts").as("ts_us"), $"event_id").as[Ev]
  }

  def firstTouch(evs: Dataset[Ev]): Dataset[Touch] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Touch]
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[St, Touch](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[St]) =>
          var st = state.getOption.getOrElse(
            St(0L, "", Long.MaxValue, Long.MaxValue, purchased = false))
          batch.foreach { e =>
            val earlier = e.ts_us < st.ts_us ||
              (e.ts_us == st.ts_us && e.event_id < st.event_id)
            st = St(
              st.n + 1L,
              if (earlier) e.event_type else st.first_type,
              if (earlier) e.ts_us else st.ts_us,
              if (earlier) e.event_id else st.event_id,
              st.purchased || e.event_type == "purchase")
          }
          state.update(st)
          Iterator.single(Touch(uid, st.n, st.first_type, st.purchased))
      }
  }
}
