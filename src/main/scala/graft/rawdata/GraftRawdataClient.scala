package graft.rawdata

import java.io.File

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.streaming.TopicStream

/** The reference client's surface (RawdataClient / RawdataProducer /
  * RawdataConsumer / RawdataMetadataClient — README.md:1-40) as one
  * Spark-native facade, so a user of the reference can switch call-for-
  * call:
  *
  * | reference                                   | graft                       |
  * | ------------------------------------------- | --------------------------- |
  * | client.producer(topic) → buffer/publish     | producer(topic).publish(df) |
  * | client.consumer(topic) → receive loop       | consumer(topic).messages / tail |
  * | consumer.seek(timestamp)                    | consumer(topic).seek(ts)    |
  * | client.cursorOf(ulid, inclusive)            | consumer(topic).after(ulidHex, inclusive) |
  * | client.cursorOf(position, approxTs, tol)    | cursorOf(topic, position, approxTs, tol) |
  * | client.lastMessage(topic)                   | lastMessage(topic)          |
  * | client.metadata(topic) keys/get/put         | metadata(topic).*           |
  *
  * The base directory plays the role of the reference's bucket/folder
  * root; topics are subdirectories of Avro files in the reference's
  * naming scheme, so the two implementations can read each other's
  * topics (format compatibility is asserted in TopicSpec).
  */
final class GraftRawdataClient(spark: SparkSession, baseDir: String) {

  def topicDir(topic: String): String = new File(baseDir, topic).getAbsolutePath

  // ---------------------------------------------------------------- produce

  final class Producer(topic: String, cfg: TopicConfig) {
    /** Publish a message DataFrame (id, orderingGroup, sequenceNumber,
      * position, data) — the distributed equivalent of the reference's
      * buffer(...).publish(positions): one shuffle clusters messages into
      * the reference's (time-window, byte-chunk) file layout.
      */
    def publish(messages: DataFrame): Seq[TopicFile] =
      Topic.write(messages, topicDir(topic), cfg)
  }

  def producer(topic: String, cfg: TopicConfig = TopicConfig()): Producer =
    new Producer(topic, cfg)

  // ---------------------------------------------------------------- consume

  final class Consumer(topic: String) {
    /** full ordered scan (ordered by ULID — the reference's stream order) */
    def messages: Dataset[RawdataMessage] = Topic.read(spark, topicDir(topic))

    /** decoded DataFrame (ulid_hex, ts_ms columns added) */
    def messagesDF: DataFrame = Topic.readDF(spark, topicDir(topic))

    /** consumer.seek(timestamp): messages with ts >= t, file-pruned by name */
    def seek(timestampMs: Long): DataFrame =
      Topic.seek(spark, topicDir(topic), timestampMs)

    /** resume at/after a cursor (reference RawdataCursor semantics) */
    def after(ulidHex: String, inclusive: Boolean): DataFrame =
      Topic.afterCursor(spark, topicDir(topic), ulidHex, inclusive)

    /** unbounded tail (the receive() poll loop as Structured Streaming) */
    def tail: Dataset[RawdataMessage] = TopicStream.messages(spark, topicDir(topic))
  }

  def consumer(topic: String): Consumer = new Consumer(topic)

  // ----------------------------------------------------------------- client

  /** cursorOf(position, approxTimestamp, tolerance): bounded time-range
    * scan for the message with that position
    * (reference AvroRawdataClient.java:89-115)
    */
  def cursorOf(topic: String, position: String, approxTsMs: Long, toleranceMs: Long): Option[String] =
    Topic.positionToUlidHex(spark, topicDir(topic), position, approxTsMs, toleranceMs)

  /** lastMessage(topic): last-file last-block fast path
    * (reference AvroRawdataClient.java:126-147)
    */
  def lastMessage(topic: String): Option[RawdataMessage] =
    Topic.lastMessage(topicDir(topic))

  // --------------------------------------------------------------- metadata

  final class Metadata(topic: String) {
    def keys: Seq[String] = MetadataStore.keys(spark, topicDir(topic))
    def get(key: String): Option[Array[Byte]] = MetadataStore.get(spark, topicDir(topic), key)
    def put(updates: DataFrame): Unit = MetadataStore.put(spark, topicDir(topic), updates)
    def asDF: DataFrame = MetadataStore.readAll(spark, topicDir(topic))
  }

  def metadata(topic: String): Metadata = new Metadata(topic)
}
