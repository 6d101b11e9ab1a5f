package graft.rawdata

import graft.SparkSpec

/** Topic.expire — metadata-only log retention. The op may only delete
  * files every one of whose messages is older than the cutoff, must keep
  * everything at-or-after it, and must leave the topic readable.
  */
class RetentionSpec extends SparkSpec {

  test("expire deletes exactly the provably-old files and keeps all recent messages") {
    val dir = Topic.tempDir("expire")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf), dir, EventsAsTopic.cfg)

    val before = Topic.read(spark, dir).collect()
    val files = Topic.listFiles(dir)
    assert(files.length >= 3, "need a multi-file topic to exercise retention")

    // cutoff: the third file's from-ts → the first two files are the only
    // candidates, and only those whose SUCCESSOR starts strictly before it
    val cutoff = files(2).fromTsMs
    val expired = Topic.expire(dir, cutoff)

    val expectedExpired = files.zip(files.tail)
      .collect { case (f, next) if next.fromTsMs < cutoff => f.path }
    assert(expired.map(_.path) === expectedExpired)
    assert(expired.nonEmpty)

    val after = Topic.read(spark, dir).collect()
    val afterIds = after.map(_.id.toSeq).toSet
    def ts(id: Seq[Byte]): Long =
      id.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    // nothing at-or-after the cutoff was lost
    val recent = before.filter(m => ts(m.id.toSeq) >= cutoff)
    assert(recent.forall(m => afterIds.contains(m.id.toSeq)))
    // everything deleted was strictly older than the cutoff
    val deleted = before.filterNot(m => afterIds.contains(m.id.toSeq))
    assert(deleted.nonEmpty)
    assert(deleted.forall(m => ts(m.id.toSeq) < cutoff))
    // idempotent second pass at the same cutoff deletes nothing new
    assert(Topic.expire(dir, cutoff).isEmpty)
  }

  // the successor-bound prefilter assumes non-overlapping ULID ranges,
  // but publish accepts caller-supplied ULIDs — a later session can land
  // a file whose span REACHES PAST its successor's start. Such a file
  // must survive expire even when the successor bound nominates it.
  test("an overlapping out-of-order file is never expired") {
    import spark.implicits._
    val dir = Topic.tempDir("expire-overlap")
    def ulid(tsMs: Long, n: Long): Array[Byte] = {
      val b = new Array[Byte](16)
      (0 until 6).foreach(i => b(i) = ((tsMs >> (8 * (5 - i))) & 0xff).toByte)
      (0 until 8).foreach(j => b(15 - j) = ((n >> (8 * j)) & 0xff).toByte)
      b
    }
    def msg(tsMs: Long, n: Long) =
      RawdataMessage(ulid(tsMs, n), Some("og"), 1L, s"p$n", Map("d" -> Array[Byte](1)))
    val H = 3600L * 1000
    val T = 1700006400000L // multiple of 4H: windows align across configs
    // session 1: files [T, T+3m] and [T+2h ...] — normal ordered topic
    Topic.write(spark.createDataset(Seq(
      msg(T, 1), msg(T + 180000, 2))).toDF(), dir, TopicConfig(maxWindowMs = H))
    Topic.invalidateListing(dir)
    Topic.write(spark.createDataset(Seq(
      msg(T + 2 * H, 3), msg(T + 2 * H + 60000, 4))).toDF(), dir, TopicConfig(maxWindowMs = H))
    Topic.invalidateListing(dir)
    // session 2 (out of order): one 4H-window file STARTING before the
    // second file but CONTAINING a message after the cutoff → its span
    // overlaps both session-1 files
    Topic.write(spark.createDataset(Seq(
      msg(T + 600000, 5), msg(T + 3 * H, 6))).toDF(), dir,
      TopicConfig(maxWindowMs = 4 * H))
    Topic.invalidateListing(dir)

    val files = Topic.listFiles(dir)
    assert(files.length === 3)
    // past both earlier files' starts, so the successor bound nominates
    // both; before the overlapping file's true last message
    val cutoff = T + 2 * H + 120000
    val expired = Topic.expire(dir, cutoff)
    // the successor bound nominates BOTH early files; the overlapping one
    // (containing msg 6 at T+3h >= cutoff) must be confirmed alive by its
    // own last-message bound and survive
    assert(expired.map(_.firstPosition) === Seq("p1"))
    Topic.invalidateListing(dir)
    val left = Topic.read(spark, dir).collect().map(_.position).toSet
    assert(left === Set("p3", "p4", "p5", "p6"))
  }
}
