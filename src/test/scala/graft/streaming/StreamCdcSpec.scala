package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries

/** The streaming novel-chunk gate must produce chunk verdicts identical
  * to running the shared batch chunker + store join over the same rows,
  * and its per-doc char conservation must hold (known + novel = total).
  */
class StreamCdcSpec extends SparkSpec {
  import spark.implicits._

  test("stream chunk verdicts are identical to the batch join, chars conserve") {
    val dir = graft.rawdata.Topic.tempDir("stream-cdc")
    val docs = Tables.t(spark, sf, "documents")
    // corpus = even docs (the already-stored side); stream = odd docs
    val corpus = docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
    docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", current_timestamp().as("ts"), $"text")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val (flags, caches) = CdcStream.chunkFlagsScoped(stream, corpus)
    val q = flags.writeStream.format("memory").queryName("cdcflags")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, fp, chunk_chars, known FROM cdcflags")
        .as[(Long, String, Long, Long)].collect()
      assert(streamed.nonEmpty)

      // batch twin over the same rows
      val store = DedupQueries.cdcChunked(corpus).select($"fp").distinct()
        .as[String].collect().toSet
      val batch = DedupQueries.cdcChunked(
          docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"text"))
        .select($"doc_id", $"fp", $"chunk_chars")
        .as[(Long, String, Long)].collect()
        .map { case (id, fp, len) => (id, fp, len, if (store(fp)) 1L else 0L) }

      // multiset equality (a doc can repeat a chunk)
      def ms(rows: Seq[(Long, String, Long, Long)]) =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      assert(ms(streamed.toSeq) === ms(batch.toSeq))

      // conservation: per doc, known + novel chars = total normalized chars
      val totals = docs.filter($"doc_id" % 2 === 1)
        .select($"doc_id",
          length(trim(regexp_replace(lower($"text"), "\\s+", " "))).cast("long").as("nc"))
        .filter($"nc" >= 8)
        .as[(Long, Long)].collect().toMap
      streamed.groupBy(_._1).foreach { case (id, rows) =>
        assert(rows.map(_._3).sum === totals(id), s"doc $id chars not conserved")
      }
      // both verdicts occur (the gate actually separates novel from known)
      assert(streamed.exists(_._4 == 1L) && streamed.exists(_._4 == 0L))
    } finally {
      q.stop()
      caches.close()
    }
  }
}
