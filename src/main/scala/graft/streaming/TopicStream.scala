package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.rawdata.{RawdataMessage, Ulid}

/** Structured-Streaming tail of a rawdata topic — the consumer's
  * "wait for new files" loop (reference AvroRawdataConsumer.receive,
  * :71-96, which polls the file listing) re-expressed as a stream over
  * the graft-topic DataSource V2 connector: each trigger lists the topic
  * once, newly landed Avro files become that micro-batch's partitions,
  * and records stream straight out of the Avro decoder (the earlier
  * binaryFile form materialized each whole file as one row first).
  * Scale: one LIST per trigger; decode parallelism = files per batch.
  */
object TopicStream {

  /** Unbounded Dataset of messages from a topic directory. */
  def messages(spark: SparkSession, topicDir: String): Dataset[RawdataMessage] = {
    implicit val enc: org.apache.spark.sql.Encoder[RawdataMessage] = Encoders.product[RawdataMessage]
    spark.readStream
      .format("graft-topic")
      .load(topicDir)
      .select(col("id"), col("orderingGroup"), col("sequenceNumber"), col("position"), col("data"))
      .as[RawdataMessage]
  }

  /** Exactly-once-style tail: duplicate deliveries (re-uploaded files,
    * producer retries — the reference consumer deduplicates by ULID on
    * resume) are dropped by id within the watermark horizon. State is
    * bounded by the horizon, not the stream length.
    */
  def dedupedMessages(spark: SparkSession, topicDir: String, watermark: String = "1 hour"): DataFrame =
    messages(spark, topicDir).toDF()
      .withColumn("ulid_hex", lower(hex(col("id"))))
      .withColumn("ts", timestamp_millis(Ulid.timestampMs(col("id"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("ulid_hex")

  /** Tumbling-window message counts per ordering group with a watermark —
    * the canonical streaming aggregation over a tailed topic.
    */
  def windowedCounts(spark: SparkSession, topicDir: String, window: String = "1 day",
      watermark: Option[String] = None): DataFrame = {
    val msgs = messages(spark, topicDir).toDF()
      .withColumn("ts", timestamp_millis(Ulid.timestampMs(col("id"))))
    msgs
      // late-data bound follows the aggregation window unless overridden —
      // a fixed 1-day delay would drop late data for windows > 1 day and
      // hold short windows back a full day before final emission.
      .withWatermark("ts", watermark.getOrElse(window))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("orderingGroup"))
      .agg(count(lit(1)).as("n"))
  }
}
