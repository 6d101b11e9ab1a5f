package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Final Misra-Gries summary: total stream weight plus the surviving
  * candidate keys with their stored lower-bound counts, key-sorted so the
  * value is deterministic up to the MG guarantee (the stored counts
  * themselves depend on merge order — consumers must treat them as lower
  * bounds only, never as answers).
  */
case class MgSummary(total: Long, keys: Array[String], lowers: Array[Long])

/** Mutable per-partition buffer. Kryo-serialized only at partial-result
  * boundaries; within a partition the same instance is mutated in place.
  */
class MgBuffer(var total: Long, val counts: mutable.HashMap[String, Long])
    extends Serializable

/** Weighted Misra-Gries heavy-hitter summary as a typed [[Aggregator]] —
  * the bounded-memory, mergeable (Agarwal et al., "Mergeable
  * Summaries", PODS'12) candidate generator for EXACT heavy-hitter
  * queries at corpus scale.
  *
  * Guarantee (the law [[graft.queries.TextQueries]]'s txt_heavy and
  * MisraGriesSpec build on): after any sequence of updates and merges
  * with total weight N, every key whose true weight exceeds N/(cap+1)
  * is present in the summary, and each stored count underestimates the
  * true weight by at most N/(cap+1). So a query wanting all keys with
  * weight ≥ N/T for any T ≤ cap+1 can use the ≤cap-entry summary as a
  * PROVABLY complete candidate set and pay the exact counting shuffle
  * only for those candidates — O(cap) keys instead of the full key
  * space. That is the 100 TB point: the vocabulary of a web corpus does
  * not fit a shuffle, but its heavy tail candidates fit a broadcast.
  *
  * Decrement step amortization: each prune subtracts the buffer's
  * current minimum from every entry and evicts the zeros — total
  * decremented mass per key never exceeds N/(cap+1), so the whole
  * stream costs O(N) amortized regardless of prune frequency.
  */
class MisraGries(cap: Int) extends Aggregator[String, MgBuffer, MgSummary] {

  override def zero: MgBuffer = new MgBuffer(0L, mutable.HashMap.empty)

  private def prune(b: MgBuffer): Unit = {
    if (b.counts.size > cap) {
      // evict by the (cap+1)-th largest stored count — removes at least
      // one key per call. On the reduce path the buffer is exactly cap+1
      // entries, so the pivot is just the minimum (one pass, no sort /
      // allocation — reduce runs once per element on all-distinct
      // streams); only a merge can overshoot cap+1 and need the sort.
      val dec =
        if (b.counts.size == cap + 1) b.counts.valuesIterator.min
        else {
          val sorted = b.counts.values.toArray
          java.util.Arrays.sort(sorted)
          sorted(sorted.length - cap - 1)
        }
      val dead = mutable.ArrayBuffer.empty[String]
      b.counts.mapValuesInPlace((_, v) => v - dec)
      b.counts.foreach { case (k, v) => if (v <= 0L) dead += k }
      dead.foreach(b.counts.remove)
    }
  }

  override def reduce(b: MgBuffer, tok: String): MgBuffer = {
    b.total += 1L
    b.counts.updateWith(tok) {
      case Some(v) => Some(v + 1L)
      case None    => Some(1L)
    }
    prune(b)
    b
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    a.total += b.total
    b.counts.foreach { case (k, v) =>
      a.counts.updateWith(k) {
        case Some(w) => Some(w + v)
        case None    => Some(v)
      }
    }
    prune(a)
    a
  }

  override def finish(b: MgBuffer): MgSummary = {
    val entries = b.counts.toArray.sortBy(_._1)
    MgSummary(b.total, entries.map(_._1), entries.map(_._2))
  }

  override def bufferEncoder: Encoder[MgBuffer] = Encoders.kryo[MgBuffer]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
