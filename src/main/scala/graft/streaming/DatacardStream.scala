package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.DedupQueries

/** Streaming source-mix monitor — pipe_datacard's streaming twin: the
  * per-(source, lang) document/token-mass counts the batch data card
  * aggregates, maintained ONLINE for an ingesting corpus so mixture
  * drift (a source going dark, a language creeping in upstream) is
  * visible per micro-batch instead of at the next corpus ship.
  *
  * Pays twice, the gate-admission rule: the counts relation is
  * [[DedupQueries.datacardMixCounts]] — the SAME code the batch operator
  * aggregates — so StreamDatacardSpec proving stream == batch on every
  * snapshot (and incrementally across micro-batches) proves the
  * datacard aggregation in BOTH modes.
  *
  * Scale shape: one streaming aggregation whose state is the bounded
  * |sources|·|langs| key space — counts only, never documents, never
  * fingerprints (the unbounded-distinct n_unique axis stays batch-side
  * by design; the dedup gates own arrival-time duplicate verdicts).
  * No watermark needed because the key space, not time, bounds the
  * state. Output-mode contract: [[composeCard]] assumes ONE ROW PER
  * (source, lang) KEY — use outputMode("complete") (each trigger
  * replaces the snapshot, e.g. the memory sink) or an upsert sink keyed
  * on (source, lang); a plain append-style sink in update mode
  * accumulates every stale row version and the composed card would
  * double-count them.
  */
object DatacardStream {

  /** running per-(source, lang) mixture counts for a streaming
    * (source, lang, text, …) relation — (source, lang, c, tok)
    */
  def mixCounts(docs: DataFrame): DataFrame =
    DedupQueries.datacardMixCounts(docs)

  /** compose the data card's mixture columns (source, n_docs, n_tokens,
    * n_langs, top_lang, top_lang_ppm) from a counts snapshot — the
    * bounded batch tail shared with pipe_datacard
    */
  def composeCard(countsSnapshot: DataFrame): DataFrame =
    DedupQueries.datacardMixture(countsSnapshot)
}
