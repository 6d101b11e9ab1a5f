package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming winnowing gate must agree with batch semantics: the
  * (arriving doc, corpus match) flag set produced by tailing the probe
  * slice from a topic equals the batch fingerprint join over the same
  * split — same row-local selection (winnowSigs is literally shared),
  * same posting-list cap, so this pins the stream-static plumbing and
  * the watermark-bounded pair dedup.
  */
class StreamWinnowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming winnow flags match the batch fingerprint join on the same split") {
    val dir = Topic.tempDir("stream-winnow")
    val docs = Tables.t(spark, sf, "documents")
    val corpus = docs.filter($"doc_id" % 10 =!= 0).select($"doc_id", $"text")
    val incoming = docs.filter($"doc_id" % 10 === 0)

    val msgs = incoming.select(
      Ulid.deterministic(lit(1700000000000L) + $"doc_id" * 1000, $"doc_id").as("id"),
      $"lang".as("orderingGroup"),
      $"doc_id".as("sequenceNumber"),
      concat(lit("doc-"), $"doc_id".cast("string")).as("position"),
      map(lit("text"), encode($"text", "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val streamDocs = TopicStream.messages(spark, dir).toDF()
      .select(
        $"sequenceNumber".as("doc_id"),
        decode(element_at($"data", "text"), "UTF-8").as("text"),
        timestamp_millis(Ulid.timestampMs($"id")).as("ts"))

    val (flags, caches) = CleanStream.winnowFlagsScoped(streamDocs, corpus)
    val q = flags
      .writeStream.format("memory").queryName("winnowgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, match_doc FROM winnowgate")
        .as[(Long, Long)].collect().toSet

      // batch truth: the same probe-vs-corpus fingerprint join with the
      // same <= 15-corpus-doc posting cap
      val sigC = DedupQueries.winnowSigs(corpus)
        .select($"doc_id".as("match_doc"), $"fp").distinct()
      val capped = sigC.groupBy($"fp").agg(count(lit(1)).as("n_docs"))
        .filter($"n_docs" <= 15).select($"fp")
      val expected = DedupQueries.winnowSigs(incoming.select($"doc_id", $"text"))
        .select($"doc_id", $"fp").distinct()
        .join(sigC.join(capped, Seq("fp")), Seq("fp"))
        .filter($"doc_id" =!= $"match_doc")
        .select($"doc_id", $"match_doc").distinct()
        .as[(Long, Long)].collect().toSet

      assert(expected.nonEmpty, "the sf0.001 split has known cross-set near-dups")
      assert(streamed === expected)
    } finally {
      q.stop()
      caches.close()
      spark.catalog.clearCache()
    }
  }
}
