package graft.streaming

import graft.SparkSpec
import graft.rawdata.{EventsAsTopic, Topic, TopicConfig}

class TopicStreamSpec extends SparkSpec {

  test("streaming tail picks up files that land after the stream starts") {
    val dir = Topic.tempDir("topic-stream")
    val messages = EventsAsTopic.messagesFromEvents(spark, sf).cache()
    val total = messages.count()
    val half = timestampSplit(messages)

    // first half of the topic exists before the stream starts
    Topic.write(messages.filter(half._1), dir, EventsAsTopic.cfg)

    val q = TopicStream.messages(spark, dir).toDF()
      .writeStream.format("memory").queryName("tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      val n1 = spark.sql("SELECT COUNT(*) FROM tail").collect().head.getLong(0)
      assert(n1 > 0 && n1 < total)

      // new files land while tailing → discovered incrementally
      Topic.write(messages.filter(half._2), dir, EventsAsTopic.cfg)
      q.processAllAvailable()
      val n2 = spark.sql("SELECT COUNT(*) FROM tail").collect().head.getLong(0)
      assert(n2 === total, s"expected $total tailed messages, got $n2")
    } finally q.stop()
  }

  test("deduped tail drops duplicate deliveries by ULID") {
    val dir = Topic.tempDir("topic-stream-dedup")
    val messages = EventsAsTopic.messagesFromEvents(spark, sf).limit(200).cache()
    val n = messages.count()
    // the same messages land twice (e.g. a retried upload) under a
    // different windowing → differently-named files, duplicate ULIDs
    Topic.write(messages, dir, EventsAsTopic.cfg)
    Topic.write(messages, dir, EventsAsTopic.cfg.copy(maxWindowMs = EventsAsTopic.DayMs / 2))
    val raw = Topic.read(spark, dir).count()
    assert(raw > n, "test setup must actually produce duplicates")
    val q = TopicStream.dedupedMessages(spark, dir, watermark = "30 days")
      .writeStream.format("memory").queryName("dedup_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT COUNT(*), COUNT(DISTINCT ulid_hex) FROM dedup_tail")
        .collect().head
      assert(got.getLong(0) === n)
      assert(got.getLong(1) === n)
    } finally q.stop()
  }

  test("windowed counts with watermark run on a tailed topic") {
    val dir = Topic.tempDir("topic-stream-agg")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf), dir, EventsAsTopic.cfg)
    val q = TopicStream.windowedCounts(spark, dir)
      .writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT COUNT(*) FROM winagg").collect().head.getLong(0)
      assert(rows > 0)
    } finally q.stop()
  }

  private def timestampSplit(messages: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    val cut = graft.rawdata.Ulid.timestampMs(col("id"))
    val mid = messages.select(percentile_approx(cut, lit(0.5), lit(100))).collect().head.getLong(0)
    (cut <= mid, cut > mid)
  }
}
