package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Streaming cross-source exact-duplicate gate — dd_exact_cross's
  * streaming twin: each arriving document is fingerprinted AS IT LANDS
  * (the batch operator's exact normalization, shared via
  * [[DedupQueries.normFpCol]]) and checked against the corpus
  * per-(fingerprint, source) COUNTS relation, so an ingest pipeline
  * knows per document which sources already hold byte-identical
  * (normalized) content and how many copies — the syndication verdict
  * dd_exact_cross aggregates after the fact, delivered at arrival time.
  *
  * Scale shape: fingerprinting is row-local, so the gate is STATELESS —
  * no watermark, no state store; the only non-narrow operator is a
  * stream-static join on the 32-hex fingerprint against the
  * once-persisted counts store ([[DedupQueries.exactCrossCounts]], the
  * same relation the batch operator aggregates — which is what makes
  * the counts arithmetic provable in BOTH modes: each verdict row's
  * `n_existing` is exactly the pair-count delta the arrival adds to
  * dd_exact_cross, c for its own source via C(c+1,2) − C(c,2) and c′
  * for every other, a law StreamExactCrossSpec pins). Document bodies
  * never shuffle: the join carries (doc_id, source, fp) only, and the
  * store is |fingerprints|·|sources| counts, never documents.
  */
object ExactCrossStream {

  /** per-arriving-doc syndication verdicts. `docs`: streaming
    * (doc_id, source, text, …). `corpus`: static documents. Returns one
    * row per corpus source already holding the arrival's normalized
    * content — (doc_id, source, dup_source, n_existing) — or a single
    * (doc_id, source, NULL, 0) row for novel documents.
    */
  def dupFlags(docs: DataFrame, corpus: DataFrame): DataFrame =
    dupFlagsScoped(docs, corpus)._1

  def dupFlagsScoped(docs: DataFrame, corpus: DataFrame): (DataFrame, GateCaches) = {
    import corpus.sparkSession.implicits._
    val store = DedupQueries.exactCrossCounts(corpus)
      .select($"fp", $"source".as("dup_source"), $"c".as("n_existing"))
      .persist()
    val flags = docs
      .select($"doc_id", $"source", DedupQueries.normFpCol($"text").as("fp"))
      .join(store, Seq("fp"), "left")
      .select($"doc_id", $"source", $"dup_source",
        coalesce($"n_existing", lit(0L)).as("n_existing"))
    (flags, new GateCaches(Seq(store)))
  }
}
