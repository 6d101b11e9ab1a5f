package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming near-dup gate must agree with batch semantics: the set
  * of (arriving doc, corpus match, jaccard) flags produced by tailing
  * the new-batch slice from a topic equals the batch band-join + verify
  * over the same split. This proves the stream-static plumbing (narrow
  * signature build, two stream-static joins, watermark-bounded pair
  * dedup) — the underlying operators are value-checked by the dd_*
  * oracles.
  */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("per-row band signatures equal the batch groupBy band signatures") {
    val docs = Tables.t(spark, sf, "documents")
    val arr = DedupQueries.shingleArrays(docs)
    val narrow = DedupQueries.bandArrays(arr)
      .select($"doc_id", $"band", $"bkey").as[(Long, Int, String)].collect().toSet
    val batch = DedupQueries.bandsFrom(
        arr.select($"doc_id", explode($"ss").as("s")))
      .as[(Long, Int, String)].collect().toSet
    assert(narrow.nonEmpty && narrow === batch)
  }

  test("streaming near-dup flags match the batch band-join + jaccard verify") {
    val dir = Topic.tempDir("stream-neardup")
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

    val q = CleanStream.nearDupFlags(streamDocs, corpus)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, match_doc, jaccard_ppm FROM neardup")
        .as[(Long, Long, Long)].collect().toSet

      // batch truth over the same split: cross-set band collisions,
      // verified by exact jaccard on the shingle arrays. Uses the
      // per-row signature builder — equality with the groupBy batch
      // form is itself oracle-proven via dd_minhash, so this pins the
      // narrow form to the same values.
      val arrAll = DedupQueries.shingleArrays(docs)
      val bands = DedupQueries.bandArrays(arrAll).select($"doc_id", $"band", $"bkey")
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") % 10 === 0 && col("b.doc_id") % 10 =!= 0)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      val expected = cand
        .join(arrAll.select($"doc_id".as("doc_a"), $"ss".as("sa")), Seq("doc_a"))
        .join(arrAll.select($"doc_id".as("doc_b"), $"ss".as("sb")), Seq("doc_b"))
        .withColumn("n_int", size(array_intersect($"sa", $"sb")).cast("long"))
        .withColumn("jaccard_ppm",
          floor($"n_int" / (size($"sa") + size($"sb") - $"n_int") * lit(1000000.0) + lit(0.5))
            .cast("long"))
        .filter($"jaccard_ppm" >= 400000)
        .select($"doc_a", $"doc_b", $"jaccard_ppm")
        .as[(Long, Long, Long)].collect().toSet

      assert(expected.nonEmpty, "the sf0.001 split has known cross-set near-dups")
      assert(streamed === expected)
      spark.catalog.clearCache()
    } finally q.stop()
  }
}
