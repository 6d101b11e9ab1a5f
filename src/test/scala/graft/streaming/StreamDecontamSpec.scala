package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming decontamination gate must flag exactly the
  * (train doc, bench doc) pairs the batch audit (dd_decontam's
  * min-bench-per-shingle index) derives from the same corpus split —
  * stream-static join parity, id for id.
  */
class StreamDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming decontam flags match the batch shingle-overlap audit") {
    val dir = Topic.tempDir("stream-decontam")
    val docs = Tables.t(spark, sf, "documents").select($"doc_id", $"text")
    val train = docs.filter($"doc_id" % 17 =!= 0)
    val bench = docs.filter($"doc_id" % 17 === 0)

    val msgs = train.select(
      Ulid.deterministic(lit(1700000000000L) + $"doc_id" * 1000, $"doc_id").as("id"),
      lit("g").as("orderingGroup"),
      $"doc_id".as("sequenceNumber"),
      concat(lit("doc-"), $"doc_id".cast("string")).as("position"),
      map(lit("text"), encode($"text", "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val streamDocs = TopicStream.messages(spark, dir).toDF()
      .select(
        $"sequenceNumber".as("doc_id"),
        decode(element_at($"data", "text"), "UTF-8").as("text"),
        timestamp_millis(Ulid.timestampMs($"id")).as("ts"))

    val q = CleanStream.decontamFlags(streamDocs, bench)
      .writeStream.format("memory").queryName("decontam").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, bench_doc FROM decontam")
        .as[(Long, Long)].collect().toSet

      // batch truth: per-shingle min bench doc, distinct overlap pairs
      val sh = DedupQueries.shingleArrays(docs)
        .select($"doc_id", explode($"ss").as("s"))
      val benchIdx = sh.filter($"doc_id" % 17 === 0)
        .groupBy($"s").agg(min($"doc_id").as("bench_doc"))
      val expected = sh.filter($"doc_id" % 17 =!= 0)
        .join(benchIdx, Seq("s"))
        .select($"doc_id", $"bench_doc").distinct()
        .as[(Long, Long)].collect().toSet

      assert(expected.nonEmpty, "fixture must actually contain contamination")
      assert(streamed === expected)
    } finally {
      q.stop()
      spark.catalog.clearCache()
    }
  }
}
