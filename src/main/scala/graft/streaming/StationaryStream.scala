package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transition-matrix gate — ev_stationary's online twin: each
  * user's Markov state (last event + cumulative (from → to) transition
  * counts) maintained as flatMapGroupsWithState state and re-emitted
  * after every micro-batch, so the global long-run traffic-share
  * forecast (the 8-step integer power iteration) can be recomputed from
  * the merged matrices at ANY point in the stream instead of waiting for
  * the nightly batch unroll.
  *
  * Why this is the right streaming shape: per-user state is the previous
  * event (one row) plus the (from, to) → count map — bounded by
  * |types|², never by event volume — and transition-count maps merge
  * additively, so the global matrix is the sum of the per-user finals in
  * any order. The forecast itself runs on the merged |types|²-bounded
  * matrix through [[forecastPpm]], the EXACT integer pipeline of the
  * batch operator (floor-ppm rows, sum-then-floor-divide steps), so the
  * drained stream's forecast is value-identical to batch ev_stationary
  * (StreamStationarySpec).
  *
  * Ordering contract: within a user, events must arrive in (ts_us,
  * event_id) order ACROSS micro-batches — the per-ordering-group
  * in-order delivery the topic engine already guarantees consumers
  * (AvroRawdataClient semantics; a consumer feeding this gate from a
  * topic satisfies it by construction). Within one micro-batch the group
  * iterator carries no order, so the batch slice is sorted before
  * folding (bounded by the micro-batch, not the stream).
  */
object StationaryStream {
  case class Ev(user_id: Long, event_type: String, ts_us: Long, event_id: Long)

  /** per-user state: previous event + flattened cumulative count map */
  case class St(lastTs: Long, lastId: Long, lastType: String,
      froms: Array[String], tos: Array[String], ns: Array[Long])

  /** per-user emission after a micro-batch: cumulative transition count
    * + the flattened (from, to, n) matrix at that point (the spec keeps
    * each user's final emission = its max n_trans row)
    */
  case class Trans(user_id: Long, n_trans: Long,
      froms: Array[String], tos: Array[String], ns: Array[Long])

  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select($"user_id", $"event_type",
      unix_micros($"ts").as("ts_us"), $"event_id").as[Ev]
  }

  def transitions(evs: Dataset[Ev]): Dataset[Trans] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Trans]
    evs.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[St, Trans](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[St]) =>
          val prev = state.getOption
          val m = mutable.HashMap.empty[(String, String), Long]
          prev.foreach(st => st.froms.indices.foreach(i =>
            m.update((st.froms(i), st.tos(i)), st.ns(i))))
          var lastTs = prev.map(_.lastTs).getOrElse(Long.MinValue)
          var lastId = prev.map(_.lastId).getOrElse(Long.MinValue)
          var lastType = prev.map(_.lastType).orNull
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (lastType != null) {
              val k = (lastType, e.event_type)
              m.update(k, m.getOrElse(k, 0L) + 1L)
            }
            lastTs = e.ts_us; lastId = e.event_id; lastType = e.event_type
          }
          val ks = m.keysIterator.toArray
          state.update(St(lastTs, lastId, lastType,
            ks.map(_._1), ks.map(_._2), ks.map(m)))
          Iterator.single(Trans(uid, m.valuesIterator.sum,
            ks.map(_._1), ks.map(_._2), ks.map(m)))
      }
  }

  /** the batch formula, shared with the spec: ev_markov's floor-ppm rows
    * (p = n·10⁶ div from_total) then 8 steps of x'(b) = ⌊Σ_a x(a)·p(a,b)
    * / 10⁶⌋ from the uniform x₀ = 10⁶ div |states| over the states with
    * outgoing transitions — every term non-negative, so truncation IS
    * floor, matching the batch DECIMAL division step for step
    */
  def forecastPpm(counts: Iterable[(String, String, Long)], steps: Int = 8): Map[String, Long] = {
    val fromTotal = counts.groupBy(_._1).map { case (a, g) => a -> g.map(_._3).sum }
    val p = counts.map { case (a, b, n) => (a, b, n * 1000000L / fromTotal(a)) }
    val states = counts.map(_._1).toSeq.distinct
    if (states.isEmpty) return Map.empty
    var x: Map[String, Long] = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to steps) {
      val nx = mutable.HashMap.empty[String, Long]
      for ((a, b, pp) <- p; xa <- x.get(a))
        nx.update(b, nx.getOrElse(b, 0L) + xa * pp)
      x = nx.map { case (b, s) => b -> s / 1000000L }.toMap
    }
    x
  }
}
