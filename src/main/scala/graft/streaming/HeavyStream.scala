package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{MgBuffer, MisraGries}

/** Streaming heavy-hitter gate — txt_heavy's streaming twin: a
  * per-source Misra-Gries summary maintained as flatMapGroupsWithState
  * state, emitting each source's current candidate set after every
  * micro-batch. The monitoring form of the batch operator: a crawl
  * pipeline watches which tokens are flooding each source AS THEY
  * ARRIVE (spam phrases, boilerplate bursts) without ever keying state
  * by token.
  *
  * Why this is the right streaming shape: the MG summary is bounded
  * (≤cap entries per source — state is O(sources·cap) forever, no
  * timeout needed) and MERGEABLE, so the same guarantee the batch
  * Aggregator proves (every token above totalWeight/(cap+1) survives —
  * MisraGriesSpec) holds across any micro-batch arrival order; the
  * emitted lower bounds underestimate by at most total/(cap+1)
  * (StreamHeavySpec asserts both laws against the stream's own totals).
  * A token-keyed exact count would grow state with the vocabulary —
  * the exact thing the two-pass batch design exists to avoid.
  */
object HeavyStream {
  case class Tok(source: String, tok: String)
  /** candidate emission: summary state after a micro-batch. `total` is
    * the exact per-source token count seen so far (exact even though
    * the per-token counts are lower bounds).
    */
  case class Cand(source: String, tok: String, lower: Long, total: Long)
  /** product-encodable snapshot of the MG buffer */
  case class St(total: Long, keys: Array[String], lowers: Array[Long])

  /** docs: streaming (source, text) — whitespace tokens, empty dropped
    * (the batch operator's tokenization)
    */
  def fromDocs(docs: DataFrame): Dataset[Tok] = {
    import docs.sparkSession.implicits._
    docs.select($"source", explode(split($"text", " +")).as("tok"))
      .filter(length($"tok") > 0)
      .as[Tok]
  }

  def candidates(toks: Dataset[Tok], cap: Int): Dataset[Cand] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Cand]
    val mg = new MisraGries(cap)
    toks.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[St, Cand](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[Tok], state: GroupState[St]) =>
          val buf = state.getOption match {
            case Some(st) =>
              new MgBuffer(st.total,
                mutable.HashMap.from(st.keys.iterator.zip(st.lowers.iterator)))
            case None => mg.zero
          }
          batch.foreach(t => mg.reduce(buf, t.tok))
          val s = mg.finish(buf)
          state.update(St(s.total, s.keys, s.lowers))
          s.keys.iterator.zip(s.lowers.iterator)
            .map { case (k, lo) => Cand(source, k, lo, s.total) }
      }
  }
}
