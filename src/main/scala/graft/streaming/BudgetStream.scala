package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SamplingQueries

/** Streaming token-budget admission gate — samp_token_budget's streaming
  * twin: each source's arriving documents spend a shared per-source token
  * budget, and once it is exhausted the gate closes for that source. The
  * quota-at-ingest form of the batch selector: instead of a nightly pass
  * choosing which docs fit the mixture, the crawl is capped as it lands.
  *
  * Ordering deviation, stated: the batch operator admits in the
  * deterministic (hash, doc_id) order; an unbounded stream has only
  * arrival order. The gate restores the batch order WITHIN each
  * micro-batch (a group's rows are sorted by (hash, doc_id) before
  * spending), so a one-batch replay is id-identical to the batch
  * operator (StreamBudgetSpec proves it) and a multi-batch run admits
  * every micro-batch in the same deterministic order.
  *
  * Scale shape: per-row token count and admission hash are the batch
  * operator's own narrow expressions; the only stateful operator keeps
  * ONE long per source (tokens spent) — O(sources), independent of
  * stream length, no timeout (a budget never reopens). Rejected docs
  * still spend (the batch window sums over every doc), which is
  * admission-equivalent — once the budget is crossed the gate is closed
  * either way — and keeps the running total meaningful as a meter.
  */
object BudgetStream {
  case class Doc(source: String, docId: Long, nTok: Long, h: Long)
  case class Admit(source: String, docId: Long, nTok: Long, cumBefore: Long)
  /** per-source state (public: the state encoder's generated code needs
    * accessor visibility)
    */
  case class St(spent: Long)

  /** docs: streaming (source, doc_id, text) — token count and admission
    * hash derived with the batch operator's shared expressions
    */
  def fromDocs(docs: DataFrame): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.select($"source", $"doc_id".as("docId"),
      size(split($"text", " +")).cast("long").as("nTok"),
      SamplingQueries.docHash.as("h")).as[Doc]
  }

  def admitted(docs: Dataset[Doc], budget: Long): Dataset[Admit] = {
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Admit]
    docs.groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[St, Admit](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[Doc], state: GroupState[St]) =>
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = Seq.newBuilder[Admit]
          batch.toSeq.sortBy(d => (d.h, d.docId)).foreach { d =>
            if (spent < budget) out += Admit(source, d.docId, d.nTok, spent)
            spent += d.nTok
          }
          state.update(St(spent))
          out.result().iterator
      }
  }
}
