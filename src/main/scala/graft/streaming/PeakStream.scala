package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming peak-load gate — ev_peak's streaming twin: per event type,
  * the trailing-60-minute peak maintained as flatMapGroupsWithState
  * state and re-emitted after every micro-batch. The monitoring form of
  * the batch operator: an ops pipeline watches the worst trailing hour
  * a stream has EVER hit (the capacity number) as events arrive, in any
  * batch/arrival order — the minute histogram is a commutative merge,
  * so the final emission is batch-order independent.
  *
  * Why this is the right streaming shape: state is the per-type
  * (minute → count) histogram, bounded by the CALENDAR span (the same
  * bound the batch operator's window relation has), never by event
  * count; the peak scan per batch is a two-pointer pass over the sorted
  * active minutes — O(active minutes), no per-event state. A production
  * deployment with an unbounded horizon would evict minutes older than
  * watermark − 60 min once the peak-so-far is folded into a scalar;
  * the gate keeps the full histogram so StreamPeakSpec can prove exact
  * equality with the batch value-RANGE window at any replay point.
  */
object PeakStream {
  case class Ev(event_type: String, minute: Long)
  /** emission after each micro-batch; `n_events_seen` is the exact
    * running total, so the row with the max is the final verdict
    */
  case class Peak(event_type: String, peak_events: Long, peak_minute: Long,
      n_active_minutes: Long, n_events_seen: Long)
  /** product-encodable (minute → count) histogram snapshot */
  case class St(minutes: Array[Long], counts: Array[Long])

  /** events: streaming rows with (event_type, ts timestamp) */
  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select($"event_type", expr("unix_micros(ts) div 60000000").as("minute"))
      .as[Ev]
  }

  /** the batch operator's exact peak rule on a (minute → count) map:
    * trailing [e-59, e] sums at every ACTIVE end minute, max first,
    * EARLIEST end minute as the tie-break
    */
  private[streaming] def scanPeak(m: collection.Map[Long, Long]): (Long, Long) = {
    val ms = m.keys.toArray.sorted
    var lo = 0
    var run = 0L
    var best = -1L
    var bestMin = 0L
    var hi = 0
    while (hi < ms.length) {
      run += m(ms(hi))
      while (ms(lo) < ms(hi) - 59) { run -= m(ms(lo)); lo += 1 }
      if (run > best) { best = run; bestMin = ms(hi) }
      hi += 1
    }
    (best, bestMin)
  }

  def peaks(evs: Dataset[Ev]): Dataset[Peak] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Peak]
    evs.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState[St, Peak](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, batch: Iterator[Ev], state: GroupState[St]) =>
          val m = mutable.HashMap.empty[Long, Long]
          state.getOption.foreach { st =>
            st.minutes.iterator.zip(st.counts.iterator).foreach {
              case (k, v) => m(k) = v
            }
          }
          batch.foreach(e => m(e.minute) = m.getOrElse(e.minute, 0L) + 1L)
          val ks = m.keys.toArray
          state.update(St(ks, ks.map(m)))
          val (peak, peakMin) = scanPeak(m)
          Iterator.single(Peak(t, peak, peakMin, ks.length.toLong, m.values.sum))
      }
  }
}
