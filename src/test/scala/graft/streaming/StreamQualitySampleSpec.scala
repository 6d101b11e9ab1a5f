package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.{SamplingQueries, TextQueries}
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming quality-weighted sampling gate must agree with the
  * batch sampler VERDICT-FOR-VERDICT: the acceptance rule is a pure
  * per-row function of (doc_id, text), so unlike the dedup gates there
  * is no arrival-order slack — every doc's (q_ppm, keep) must be
  * identical to the batch computation on the same rows.
  */
class StreamQualitySampleSpec extends SparkSpec {
  import spark.implicits._

  test("streaming quality-sample verdicts are id-identical to the batch rule") {
    val dir = Topic.tempDir("stream-qsample")
    val docs = Tables.t(spark, sf, "documents")
    val msgs = docs.select(
      Ulid.deterministic(lit(1700000000000L) + $"doc_id" * 1000, $"doc_id").as("id"),
      $"lang".as("orderingGroup"),
      $"doc_id".as("sequenceNumber"),
      concat(lit("doc-"), $"doc_id".cast("string")).as("position"),
      map(lit("text"), encode($"text", "UTF-8"),
        lit("source"), encode($"source", "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val streamDocs = TopicStream.messages(spark, dir).toDF()
      .select(
        $"sequenceNumber".as("doc_id"),
        decode(element_at($"data", "text"), "UTF-8").as("text"),
        decode(element_at($"data", "source"), "UTF-8").as("source"))

    val q = CleanStream.qualitySampleGate(streamDocs)
      .writeStream.format("memory").queryName("qsample").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, q_ppm, keep FROM qsample")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)

      val batch = TextQueries.qualityScored(docs)
        .withColumn("q_ppm", floor($"score" * lit(1000000.0) + lit(0.5)).cast("long"))
        .withColumn("keep",
          SamplingQueries.docHash * lit(2000000L) <
            $"q_ppm" * lit(SamplingQueries.hashSpace))
        .select($"doc_id", $"q_ppm", $"keep")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)

      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq,
        "streaming gate verdicts differ from the batch rule")
      // and the batch rule's kept counts are what samp_quality reports
      val reported = graft.SparkEntry.queries("samp_quality")(spark, sf)
        .agg(sum($"n_kept")).as[Long].head()
      assert(reported === batch.count(_._3).toLong)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS qsample")
    }
  }
}
