package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming bloom pre-screen gate must reach exactly the verdicts
  * the batch audit (dd_bloom's bloomScreen) assigns to the same probe
  * batch against the same corpus — including agreeing on which rows the
  * bloom screens out without ever touching the fingerprint relation.
  */
class StreamBloomSpec extends SparkSpec {
  import spark.implicits._

  test("streaming bloom verdicts match the batch pre-screen audit") {
    val dir = Topic.tempDir("stream-bloom")
    val docs = Tables.t(spark, sf, "documents").select($"doc_id", $"text")
    // dd_bloom's split: probes are doc_id % 10 == 0, corpus the rest
    val probes = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)

    val msgs = probes.select(
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

    val baselineCaches = cacheEntries
    val (verdicts, caches) = CleanStream.bloomFlagsScoped(streamDocs, corpus)
    val q = verdicts
      .writeStream.format("memory").queryName("bloomgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT doc_id, bloom_hit, exact_dup, verdict FROM bloomgate")
        .as[(Long, Boolean, Boolean, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap

      val batch = DedupQueries.bloomScreen(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("bloom_hit"), r.getAs[Boolean]("exact_dup"),
            r.getAs[String]("verdict")))).toMap

      assert(streamed.keySet === batch.keySet, "gate must emit one verdict per probe")
      assert(streamed === batch, "stream and batch verdicts diverged")
      // the law that licenses skipping the verify join for bloom misses
      assert(streamed.values.forall { case (hit, dup, _) => !dup || hit })
    } finally {
      q.stop()
      // gate teardown releases the static-side caches it pinned —
      // a session cycling gates must not accumulate blocks
      caches.close()
      assert(cacheEntries === baselineCaches,
        "closed bloom gate left pinned static-side cache entries")
      spark.catalog.clearCache()
    }
  }
}
