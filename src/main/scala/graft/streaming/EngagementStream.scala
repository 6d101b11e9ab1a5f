package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.FixedLnOps

/** Streaming engagement-entropy gate — ev_user_entropy's streaming twin:
  * each user's event-type entropy maintained online as
  * flatMapGroupsWithState state and re-emitted after every micro-batch,
  * so an engagement dashboard reads breadth shifts AS SESSIONS HAPPEN
  * instead of waiting for the nightly batch histogram.
  *
  * Why this is the right streaming shape: the state per user is the
  * (event_type → count) map — bounded by the TYPE VOCABULARY (O(users ·
  * |types|) total, no timeout needed), never by event volume, and count
  * maps merge commutatively so any micro-batch arrival order yields the
  * same final state. The entropy itself is recomputed from the map per
  * emission through the SAME exact-integer pipeline as the batch
  * operator (ln_micro kernel, non-negative integer division), so the
  * drained stream's final per-user values — and the histogram over them
  * — are value-identical to batch ev_user_entropy (StreamEntropySpec).
  */
object EngagementStream {
  case class Ev(user_id: Long, event_type: String)
  /** per-user emission after a micro-batch: exact event count + the
    * exact-integer entropy micro-nats at that point
    */
  case class Ent(user_id: Long, n: Long, h_micro: Long)
  /** product-encodable snapshot of the per-user count map */
  case class St(keys: Array[String], counts: Array[Long])

  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select($"user_id", $"event_type").as[Ev]
  }

  /** the batch formula, shared with the spec: H·10⁶ = ln_micro(N) −
    * ⌊Σ c·ln_micro(c) / N⌋ (all terms non-negative — BigInt truncation
    * IS floor here, matching the batch DECIMAL(38,0) division)
    */
  def entropyMicro(counts: Iterable[Long]): (Long, Long) = {
    val n = counts.sum
    val slc = counts.foldLeft(BigInt(0))((a, c) => a + BigInt(c) * FixedLnOps.lnMicro(c))
    (n, FixedLnOps.lnMicro(n) - (slc / n).toLong)
  }

  def entropy(evs: Dataset[Ev]): Dataset[Ent] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Ent]
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[St, Ent](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[St]) =>
          val m = state.getOption match {
            case Some(st) => mutable.HashMap.from(st.keys.iterator.zip(st.counts.iterator))
            case None => mutable.HashMap.empty[String, Long]
          }
          batch.foreach(e => m.update(e.event_type, m.getOrElse(e.event_type, 0L) + 1L))
          val ks = m.keysIterator.toArray
          state.update(St(ks, ks.map(m)))
          val (n, h) = entropyMicro(m.values)
          Iterator.single(Ent(uid, n, h))
      }
  }
}
