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
}
