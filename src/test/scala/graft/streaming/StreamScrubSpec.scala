package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming scrub gate must redact BYTE-IDENTICALLY to the batch
  * txt_scrub operator: the transform is a pure per-row function of the
  * text, so like the quality gate there is no arrival-order slack —
  * every doc's (text, n_masks) must equal the batch computation on the
  * same rows. Also pins the redaction laws the masks rely on: no raw
  * scrub-target pattern survives in the output, and untouched docs pass
  * through unchanged.
  */
class StreamScrubSpec extends SparkSpec {
  import spark.implicits._

  test("streaming scrub output is byte-identical to batch txt_scrub") {
    val dir = Topic.tempDir("stream-scrub")
    val docs = Tables.t(spark, sf, "documents")
    val msgs = docs.select(
      Ulid.deterministic(lit(1700000000000L) + $"doc_id" * 1000, $"doc_id").as("id"),
      $"lang".as("orderingGroup"),
      $"doc_id".as("sequenceNumber"),
      concat(lit("doc-"), $"doc_id".cast("string")).as("position"),
      map(lit("text"), encode($"text", "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val streamDocs = TopicStream.messages(spark, dir).toDF()
      .select(
        $"sequenceNumber".as("doc_id"),
        decode(element_at($"data", "text"), "UTF-8").as("text"))

    val q = CleanStream.scrubGate(streamDocs)
      .writeStream.format("memory").queryName("scrubbed").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, text, n_masks FROM scrubbed")
        .as[(Long, String, Long)].collect().sortBy(_._1)

      val batch = graft.SparkEntry.queries("txt_scrub")(spark, sf)
        .select($"doc_id", $"text_clean", $"n_masks")
        .as[(Long, String, Long)].collect().sortBy(_._1)

      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq,
        "streaming scrub differs from the batch transform")

      // redaction law: no email/URL/6+-digit pattern survives scrubbing
      val leaked = spark.sql(
        """SELECT count(*) FROM scrubbed
          |WHERE text RLIKE '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'
          |   OR text RLIKE 'https?://'
          |   OR text RLIKE '[0-9]{6,}'""".stripMargin).as[Long].head()
      assert(leaked === 0L, s"$leaked docs still carry a scrub-target pattern")

      // pass-through law: docs with zero masks are bit-identical inputs
      val orig = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
      streamed.filter(_._3 == 0L).foreach { case (id, text, _) =>
        assert(text === orig(id), s"mask-free doc $id was altered")
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS scrubbed")
    }
  }
}
