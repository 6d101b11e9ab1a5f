package graft.rawdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Consumer-group cursor commit/resume on the facade: a group's
  * committed position survives the consumer (and client) that wrote it,
  * and a resumed consumer receives exactly the messages published after
  * the committed cursor.
  */
class CursorCommitSpec extends SparkSpec {
  import spark.implicits._

  private def hex(m: RawdataMessage): String = m.id.map("%02x".format(_)).mkString

  test("a restarted session resumes strictly after the committed cursor") {
    val base = Topic.tempDir("cursor-commit")
    val topic = "stream"
    // split by TIME (ULIDs are time-ordered): the committed cursor after
    // the first half must sit strictly below everything in the second
    val midMs = 1705276800000L // 2024-01-15, the testdata's mid-month
    val all = EventsAsTopic.messagesFromEvents(spark, sf)
    val firstHalf = all.filter(Ulid.timestampMs($"id") < midMs)
    val secondHalf = all.filter(Ulid.timestampMs($"id") >= midMs)

    val c1 = new GraftRawdataClient(spark, base)
    try {
      c1.producer(topic).publish(firstHalf)
      val consumer = c1.consumer(topic)
      val got = consumer.receive(5000)
      assert(got.nonEmpty)
      assert(consumer.position.isDefined)
      c1.commitCursor(topic, "etl", consumer.position.get)
      assert(c1.committedCursor(topic, "etl").contains(consumer.position.get))
    } finally c1.close()

    // a different "session": new client, more data arrives, group resumes
    val c2 = new GraftRawdataClient(spark, base)
    try {
      val committed = c2.committedCursor(topic, "etl").get
      c2.producer(topic).publish(secondHalf)
      Topic.invalidateListing(c2.topicDir(topic))
      val resumed = c2.consumerFromCommitted(topic, "etl")
      val got = Iterator.continually(resumed.receive(5000))
        .takeWhile(_.nonEmpty).flatten.toSeq
      assert(got.nonEmpty)
      // everything delivered is strictly after the committed cursor ...
      assert(got.forall(m => hex(m) > committed))
      // ... and nothing published after the cursor was missed
      val expect = Topic.read(spark, c2.topicDir(topic)).collect()
        .filter(m => hex(m) > committed).map(hex).sorted.toSeq
      assert(got.map(hex).sorted === expect)
      // an uncommitted group starts from the very beginning
      assert(c2.committedCursor(topic, "fresh").isEmpty)
    } finally c2.close()
  }

  // the reference stores one object per key, so per-key puts are
  // independent; a whole-store read-modify-write would silently lose one
  // of two concurrent commits. Hammer N groups committing in parallel
  // and require EVERY commit to survive.
  test("concurrent cursor commits of different groups never lose updates") {
    val base = Topic.tempDir("cursor-race")
    val client = new GraftRawdataClient(spark, base)
    try {
      val groups = (0 until 8).map(i => s"group-$i")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val done = Future.traverse(groups.zipWithIndex) { case (g, i) =>
        Future { client.commitCursor("race", g, f"cursor-value-$i%02d") }
      }
      Await.result(done, 60.seconds)
      groups.zipWithIndex.foreach { case (g, i) =>
        assert(client.committedCursor("race", g).contains(f"cursor-value-$i%02d"),
          s"lost concurrent commit for $g")
      }
      // same-key races stay last-writer-wins: a later rewrite supersedes
      client.commitCursor("race", "group-0", "rewritten")
      assert(client.committedCursor("race", "group-0").contains("rewritten"))
      // metadata puts interleaved with cursor commits are independent too
      client.metadata("race").put("unrelated", "x".getBytes("UTF-8"))
      groups.tail.zipWithIndex.foreach { case (g, i) =>
        assert(client.committedCursor("race", g).contains(f"cursor-value-${i + 1}%02d"))
      }
    } finally client.close()
  }
}
