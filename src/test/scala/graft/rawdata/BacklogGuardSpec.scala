package graft.rawdata

import graft.SparkSpec

/** The consumer facade's backlog guard: a consumer resuming against a
  * deep backlog (many published files) must drain it over successive
  * receive() polls in batches bounded by maxMessagesPerPoll — never
  * materialize the whole backlog on the driver in one poll — while
  * delivering every message exactly once and each batch in ULID order.
  */
class BacklogGuardSpec extends SparkSpec {
  import spark.implicits._

  test("a ~100-file backlog drains through a small cap: bounded batches, order, no loss") {
    val base = Topic.tempDir("backlog-guard")
    val client = new GraftRawdataClient(spark, base)
    // hourly windows over the month-long event stream → ~hundreds of
    // small files, a deep backlog relative to the cap below
    val cfg = TopicConfig(maxWindowMs = 3600L * 1000,
      maxBytes = Long.MaxValue / 4, syncIntervalBytes = 64L * 1024)
    val msgs = EventsAsTopic.messagesFromEvents(spark, sf)
    val files = client.producer("bl", cfg).publish(msgs)
    assert(files.size >= 100, s"backlog too shallow (${files.size} files)")
    val total = files.map(_.count).sum
    val cap = 60L
    assert(total > 5 * cap, "backlog must be much deeper than the cap")
    val maxFile = files.map(_.count).max

    val consumer = client.consumer("bl", 10L, cap)
    val batches = Iterator.continually(consumer.receive(2000L))
      .takeWhile(_.nonEmpty).toSeq
    val hex = (m: RawdataMessage) => m.id.map("%02x".format(_)).mkString

    // bounded: no poll exceeded the cap (+ one file's worth of slack —
    // the guard is file-granular and always takes at least one file)
    assert(batches.size > 5, s"cap did not split the backlog (${batches.size} polls)")
    batches.foreach { b =>
      assert(b.size <= cap + maxFile,
        s"poll materialized ${b.size} messages against cap $cap (max file $maxFile)")
    }
    // order: each batch ULID-sorted, and (time-windowed producer ⇒ files
    // arrive in ts order ⇒) the concatenated stream is globally sorted
    val all = batches.flatten.map(hex)
    assert(all === all.sorted)
    // no loss, no duplicates
    val expected = msgs.count()
    assert(all.size.toLong === expected)
    assert(all.distinct.size === all.size)
    client.close()
  }
}
