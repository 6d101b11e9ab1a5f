package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the unbounded twin of the batch
  * `ev_attribution` query (EventQueries.scala): every purchase is
  * credited to the latest prior non-purchase event in the same user's
  * timeline, emitted as it happens instead of recomputed over history.
  *
  * State is ONE small string per user (the last touch type) —
  * O(active users), independent of stream length; mapGroupsWithState's
  * per-batch group sort handles intra-batch disorder, and cross-batch
  * correctness rides on the topic's ULID-ordered delivery (the same
  * contract Sessionize documents). No timeout: an attribution touch
  * never expires — callers with a TTL policy can wrap the state in
  * EventTimeTimeout the way Sessionize does.
  */
object Attribution {

  case class Touch(userId: Long, eventId: Long, eventType: String, tsMs: Long)
  case class Attributed(userId: Long, eventId: Long, attribType: String)
  /** per-user state (public for the state encoder's generated code) */
  case class St(lastTouch: String)

  def lastTouch(events: Dataset[Touch]): Dataset[Attributed] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Attributed]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[St, Attributed](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Touch], state: GroupState[St]) =>
          var last = state.getOption.map(_.lastTouch).orNull
          val out = Seq.newBuilder[Attributed]
          batch.toSeq.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
            if (e.eventType == "purchase")
              out += Attributed(userId, e.eventId, if (last == null) "none" else last)
            else last = e.eventType
          }
          if (last != null) state.update(St(last))
          out.result().iterator
      }
  }
}
