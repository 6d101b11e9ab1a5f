package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Streaming head of the corpus-cleaning pipeline: documents tailed from
  * a topic are quality-gated and exactly deduplicated AS THEY ARRIVE,
  * instead of in a nightly batch over the full corpus.
  *
  * Scale shape: the quality gate is the same codegen'd narrow pass the
  * batch pipeline uses (TextQueries.qualityScored — shared so both grade
  * documents identically), and the exact dedup is
  * dropDuplicatesWithinWatermark on the content fingerprint, whose state
  * is bounded by the watermark horizon, not the stream length. The LSH
  * near-dup stage deliberately stays a batch compaction over the cleaned
  * output (pipe_clean_corpus): its band self-join needs a corpus-wide
  * candidate set, and keeping that as streaming state would grow without
  * bound — the standard split between a streaming ingest gate and a
  * periodic wide-join compaction.
  */
object CleanStream {

  /** `docs`: streaming DataFrame with (doc_id, text, source, ts).
    * Returns the kept documents (append mode): quality ≥ 0.55 and the
    * first arrival of each exact content fingerprint within the
    * watermark horizon.
    */
  def cleanedDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    TextQueries.qualityScored(docs)
      .filter(floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long") >= 550000)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("source"), col("text"), col("ts"))
}
