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
    * bounded batch tail shared with pipe_datacard.
    *
    * The one-row-per-(source, lang) contract is ENFORCED, not just
    * documented: an append-style sink in update mode retains every
    * stale row version per key and the composed card would silently
    * double-count them — fail loudly instead. The check is one
    * aggregation over the bounded |sources|·|langs| snapshot, so the
    * eager action costs nothing that matters.
    */
  def composeCard(countsSnapshot: DataFrame): DataFrame = {
    import countsSnapshot.sparkSession.implicits._
    val dup = countsSnapshot.groupBy($"source", $"lang")
      .count().filter($"count" > 1).limit(1).count()
    require(dup == 0L,
      "composeCard: duplicate (source, lang) rows in the counts snapshot — " +
        "the sink is not complete-mode or keyed-upsert, so stale row versions " +
        "would double-count (see the output-mode contract above)")
    DedupQueries.datacardMixture(countsSnapshot)
  }
}
