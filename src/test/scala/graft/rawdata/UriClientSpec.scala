package graft.rawdata

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hadoop-FileSystem storage path: every byte of topic + metadata I/O
  * through an explicit `file://` URI — the exact URI-scheme dispatch a
  * `gs://`/`s3a://` topic takes (reference: cloudstorage/ vs filesystem/
  * backends behind one provider interface; here one code path).
  * Also covers the bounded receive(timeout) loop and incremental append.
  */
class UriClientSpec extends SparkSpec {
  import spark.implicits._

  private def messages = EventsAsTopic.messagesFromEvents(spark, sf)

  test("publish + consume round-trip through an explicit file:// URI") {
    val base = Topic.tempDirUri("uri-client")
    val client = new GraftRawdataClient(spark, base)
    assert(client.topicDir("t").startsWith("file:"))

    val metas = client.producer("t", EventsAsTopic.cfg).publish(messages)
    assert(metas.nonEmpty)
    assert(metas.forall(_.path.startsWith("file:")), "writer must return qualified URIs")

    val n = messages.count()
    assert(client.consumer("t").messages.count() === n)

    // seek, cursor resume and lastMessage all through the URI path
    val all = client.consumer("t").messagesDF.orderBy($"ulid_hex")
      .select($"ulid_hex", $"ts_ms").as[(String, Long)].collect()
    val mid = all(all.length / 2)
    assert(client.consumer("t").seek(mid._2).count() ===
      all.count(_._2 >= mid._2))
    assert(client.consumer("t").after(mid._1, inclusive = false).count() ===
      all.length - all.length / 2 - 1)
    assert(client.lastMessage("t").map(_.id.map("%02x".format(_)).mkString) ===
      Some(all.last._1))
  }

  test("metadata store round-trips behind the file:// URI") {
    val base = Topic.tempDirUri("uri-meta")
    val client = new GraftRawdataClient(spark, base)
    val updates = Seq(("owner", "graft"), ("fmt", "avro")).toDF("key", "v")
      .select($"key", encode($"v", "UTF-8").as("value"))
    client.metadata("t").put(updates)
    assert(client.metadata("t").keys === Seq("fmt", "owner"))
    assert(client.metadata("t").get("owner").map(new String(_, "UTF-8")) === Some("graft"))
  }

  test("receive on an empty topic returns empty after the timeout") {
    val client = new GraftRawdataClient(spark, Topic.tempDir("recv-empty"))
    val c = client.consumer("t", pollIntervalMs = 50)
    val t0 = System.nanoTime()
    assert(c.receive(timeoutMs = 300).isEmpty)
    assert((System.nanoTime() - t0) / 1e6 >= 300, "must block until the deadline")
  }

  test("receive delivers existing messages, then late-published files within the timeout") {
    val client = new GraftRawdataClient(spark, Topic.tempDir("recv-late"))
    val msgs = messages
    val cutoff = msgs.agg(percentile_approx(Ulid.timestampMs($"id"), lit(0.5), lit(100)))
      .as[Long].collect().head
    val batch1 = msgs.filter(Ulid.timestampMs($"id") < cutoff)
    val batch2 = msgs.filter(Ulid.timestampMs($"id") >= cutoff)
    val (n1, n2) = (batch1.count(), batch2.count())
    assert(n1 > 0 && n2 > 0)

    client.producer("t", EventsAsTopic.cfg).publish(batch1)
    val c = client.consumer("t", pollIntervalMs = 50)
    val got1 = c.receive(timeoutMs = 30000)
    assert(got1.size === n1)
    val hexes1 = got1.map(_.id.map("%02x".format(_)).mkString)
    assert(hexes1 === hexes1.sorted, "delivery must be in ULID order")
    assert(c.position === Some(hexes1.last))

    // a producer publishes while the consumer is blocked in receive; a
    // distributed publish lands files over time, so accumulate batches
    // until the whole second half arrived (each batch is one poll's
    // worth of newly landed files)
    implicit val ec: ExecutionContext = ExecutionContext.global
    Future { Thread.sleep(400); client.producer("t", EventsAsTopic.cfg).publish(batch2) }
    var got2 = Seq.empty[RawdataMessage]
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (got2.size < n2 && System.nanoTime() < deadline) {
      val batch = c.receive(timeoutMs = 10000)
      val hexes = batch.map(_.id.map("%02x".format(_)).mkString)
      assert(hexes === hexes.sorted, "each delivery must be in ULID order")
      got2 ++= batch
    }
    assert(got2.size === n2, "late files must be received within the timeout")
    val hexes2 = got2.map(_.id.map("%02x".format(_)).mkString)
    assert(hexes2.toSet.intersect(hexes1.toSet).isEmpty, "no redelivery")
    assert(hexes2.min > hexes1.last, "second half is strictly after the first")
    // drained: next receive times out empty
    assert(c.receive(timeoutMs = 200).isEmpty)
  }

  test("incremental append: a second publish lands beside the first, union in ULID order") {
    val client = new GraftRawdataClient(spark, Topic.tempDir("append"))
    val msgs = messages
    val cutoff = msgs.agg(percentile_approx(Ulid.timestampMs($"id"), lit(0.5), lit(100)))
      .as[Long].collect().head
    val batch1 = msgs.filter(Ulid.timestampMs($"id") < cutoff)
    val batch2 = msgs.filter(Ulid.timestampMs($"id") >= cutoff)

    val m1 = client.producer("t", EventsAsTopic.cfg).publish(batch1)
    val m2 = client.producer("t", EventsAsTopic.cfg).publish(batch2)
    assert(m1.map(_.path).intersect(m2.map(_.path)).isEmpty, "no filename collisions")

    val union = client.consumer("t").messagesDF
    assert(union.count() === msgs.count())
    assert(union.select("ulid_hex").distinct().count() === msgs.count())
    // the listing keeps global ULID order across the two publishes
    val files = Topic.listFiles(client.topicDir("t"))
    assert(files.map(_.fromTsMs) === files.map(_.fromTsMs).sorted)
  }

  test("an identical re-publish fails loudly instead of silently overwriting") {
    val client = new GraftRawdataClient(spark, Topic.tempDir("republish"))
    val small = messages.limit(50)
    client.producer("t", EventsAsTopic.cfg).publish(small)
    val ex = intercept[Exception] {
      client.producer("t", EventsAsTopic.cfg).publish(small)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(ex).exists(t => Option(t.getMessage).exists(_.contains("already exists"))))
  }
}
