package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.rawdata.{EventsAsTopic, Topic, Ulid}

/** Streaming sessionization on a tailed topic must agree with the batch
  * ev_session logic: every session closed by the stream is one the batch
  * computation also finds, and with the whole topic present the stream
  * closes exactly total−open sessions (one session per user stays open —
  * no later event or watermark advance closes it in a single batch).
  */
class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 1800L * 1000

  test("flatMapGroupsWithState sessions match the batch gap logic") {
    val dir = Topic.tempDir("stream-sessions")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf), dir, EventsAsTopic.cfg)

    val events = TopicStream.messages(spark, dir).toDF()
      .select(
        decode(element_at($"data", "user"), "UTF-8").cast("long").as("userId"),
        timestamp_millis(Ulid.timestampMs($"id")).as("ts"))
      .withWatermark("ts", "30 minutes")
      .as[Sessionize.Event]

    val q = Sessionize.sessions(events, GapMs)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT userId, startMs, endMs, nEvents FROM sessions")
        .as[(Long, Long, Long, Long)].collect().toSet

      // batch truth: per-user session boundaries by the same gap rule
      val batch = Tables.events(spark, sf)
        .select($"user_id".as("userId"), unix_millis($"ts").as("tsMs"))
        .as[(Long, Long)].collect()
        .groupBy(_._1)
      val perUser = batch.map { case (uid, evs) =>
        val ts = evs.map(_._2).sorted
        val sessions = Seq.newBuilder[(Long, Long, Long, Long)]
        var start = ts.head; var last = ts.head; var n = 1L
        ts.tail.foreach { t =>
          if (t - last > GapMs) { sessions += ((uid, start, last, n)); start = t; n = 0 }
          last = t; n += 1
        }
        sessions += ((uid, start, last, n))
        uid -> sessions.result()
      }
      // closed by a later event: every session but each user's last; closed
      // by event-time timeout: the last session too, when the final
      // watermark (max ts - 30min lateness) passed its end + gap
      val WatermarkMs = 1800L * 1000
      val maxTs = batch.valuesIterator.flatten.map(_._2).max
      val expectedClosed = perUser.valuesIterator.flatMap { sessions =>
        sessions.init ++ sessions.lastOption.filter(_._3 + GapMs < maxTs - WatermarkMs)
      }.toSet

      assert(streamed === expectedClosed)
    } finally q.stop()
  }
}
