package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.SamplingQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming mixture gate must admit EXACTLY the documents the batch
  * stratified sampler selects — membership is hash-deterministic, so the
  * two can be compared id-for-id (unlike the dedup gate, where arrival
  * order picks the surviving duplicate).
  */
class StreamMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("streaming mixture gate admits exactly the batch samp_stratified selection") {
    val dir = Topic.tempDir("stream-mixture")
    val docs = Tables.t(spark, sf, "documents")
    val msgs = docs.select(
      Ulid.deterministic(lit(1700000000000L) + $"doc_id" * 1000, $"doc_id").as("id"),
      $"lang".as("orderingGroup"),
      $"doc_id".as("sequenceNumber"),
      concat(lit("doc-"), $"doc_id".cast("string")).as("position"),
      map(lit("lang"), encode($"lang", "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val streamDocs = TopicStream.messages(spark, dir).toDF()
      .select(
        $"sequenceNumber".as("doc_id"),
        decode(element_at($"data", "lang"), "UTF-8").as("lang"))

    val q = CleanStream.mixtureGate(streamDocs, docs, targetPerStratum = 40L)
      .writeStream.format("memory").queryName("mixture").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT lang, doc_id FROM mixture")
        .as[(String, Long)].collect().toSet
      val batch = SamplingQueries.queries("samp_stratified")(spark, sf)
        .as[(String, Long)].collect().toSet
      assert(streamed === batch,
        "stream gate and batch sampler disagreed on the selected set")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming upsample gate emits the exact (doc, copy) multiset of the batch operator") {
    val dir = graft.rawdata.Topic.tempDir("stream-upsample")
    val docs = Tables.t(spark, sf, "documents")
    docs.select($"doc_id", $"source").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val q = CleanStream.upsampleGate(stream, docs, targetPerSource = 120L)
      .writeStream.format("memory").queryName("upsampled").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT source, doc_id, copies, copy FROM upsampled")
        .as[(String, Long, Long, Long)].collect().toSet
      val batch = SamplingQueries.queries("samp_upsample")(spark, sf)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed === batch, "stream and batch upsampling disagreed")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
