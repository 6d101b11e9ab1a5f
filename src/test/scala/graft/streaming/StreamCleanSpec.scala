package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.TextQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming cleaning gate must agree with the batch pipeline head:
  * same survivors of the quality gate, one kept document per exact
  * content fingerprint. (Which doc of a duplicate group survives depends
  * on arrival order inside a micro-batch, so the assertion is on the
  * fingerprint set, not on doc ids.)
  */
class StreamCleanSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("streaming quality gate + exact dedup matches the batch pipeline head") {
    val dir = Topic.tempDir("stream-clean")
    val docs = Tables.t(spark, sf, "documents")
    // publish the documents as topic messages (text/source in the data
    // map, synthetic event times 1 s apart so ULID order = doc_id order)
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
        decode(element_at($"data", "source"), "UTF-8").as("source"),
        timestamp_millis(Ulid.timestampMs($"id")).as("ts"))

    val q = CleanStream.cleanedDocs(streamDocs)
      .writeStream.format("memory").queryName("cleaned").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, text FROM cleaned")
        .as[(Long, String)].collect()

      // batch truth: the same quality gate, one survivor per fingerprint
      val batchKept = TextQueries.qualityScored(docs)
        .filter(floor($"score" * lit(1000000.0) + lit(0.5)).cast("long") >= 550000)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      val batchFps = batchKept.map(t => md5hex(t._2)).toSet

      assert(streamed.length === batchFps.size, "one survivor per content fingerprint")
      assert(streamed.map(t => md5hex(t._2)).toSet === batchFps)
      // every streamed survivor is a batch survivor (same quality gate)
      val batchIds = batchKept.map(_._1).toSet
      assert(streamed.forall(t => batchIds(t._1)))
    } finally q.stop()
  }
}
