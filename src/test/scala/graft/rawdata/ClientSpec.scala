package graft.rawdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference-client workflow end-to-end through the facade:
  * produce → seek → cursor resume → last message → metadata.
  */
class ClientSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Topic.tempDir("client-spec")
  private lazy val client = new GraftRawdataClient(spark, base)

  private lazy val published: Seq[TopicFile] = {
    val msgs = EventsAsTopic.messagesFromEvents(spark, sf)
    client.producer("t1", EventsAsTopic.cfg).publish(msgs)
  }

  test("producer publishes the reference file layout") {
    assert(published.nonEmpty)
    published.foreach { f =>
      assert(f.count > 0)
      assert(f.lastBlockOffset > 0, "offset must be a real sync point (post-create sync)")
      assert(new java.io.File(f.path).getName.matches(".+_\\d+_\\d+_.+\\.avro"))
    }
  }

  test("consumer reads everything in ULID order") {
    published
    val ulids = client.consumer("t1").messagesDF
      .select($"ulid_hex").as[String].collect()
    assert(ulids.length === Tables_eventsCount)
    // distributed read order is not global order; the ordered view is
    assert(ulids.sorted.distinct.length === ulids.length)
  }

  test("seek prunes to the timestamp and cursor resume is exact") {
    published
    val c = client.consumer("t1")
    val all = c.messagesDF.orderBy($"ulid_hex").select($"ulid_hex").as[String].collect()
    val mid = all(all.length / 2)
    val after = c.after(mid, inclusive = false)
      .orderBy($"ulid_hex").select($"ulid_hex").as[String].collect()
    assert(after.toSeq === all.drop(all.length / 2 + 1).toSeq)
    val atLeast = c.after(mid, inclusive = true).count()
    assert(atLeast === after.length + 1)
  }

  test("cursorOf(position) finds the message, lastMessage matches max ulid") {
    published
    val files = Topic.listFiles(client.topicDir("t1"))
    val lo = files.head.fromTsMs
    val hi = files.last.fromTsMs
    val cur = client.cursorOf("t1", "evt-42", (lo + hi) / 2, (hi - lo) / 2 + EventsAsTopic.DayMs)
    assert(cur.isDefined)
    val last = client.lastMessage("t1")
    val maxUlid = client.consumer("t1").messagesDF
      .agg(max($"ulid_hex")).as[String].collect().head
    assert(last.map(m => m.id.map("%02x".format(_)).mkString) === Some(maxUlid))
  }

  test("metadata put/get/keys round-trip") {
    published
    val updates = Seq(("owner", "graft"), ("schema", "v1"))
      .toDF("key", "v").select($"key", encode($"v", "UTF-8").as("value"))
    client.metadata("t1").put(updates)
    assert(client.metadata("t1").keys === Seq("owner", "schema"))
    assert(client.metadata("t1").get("owner").map(new String(_, "UTF-8")) === Some("graft"))
  }

  test("a consumer built from a cursor resumes mid-stream (reference consumer(topic, cursor))") {
    published
    val all = client.consumer("t1").messagesDF
      .orderBy($"ulid_hex").select($"ulid_hex").as[String].collect()
    val mid = all(all.length / 2)
    val c = client.consumer("t1", mid, false)
    // drain the bounded receive loop from the cursor
    var got = Seq.empty[String]
    var batch = c.receive(2000)
    while (batch.nonEmpty) {
      got = got ++ batch.map(_.id.map("%02x".format(_)).mkString)
      batch = c.receive(200)
    }
    assert(got.sorted === all.drop(all.length / 2 + 1).toSeq)
    val cInc = client.consumer("t1", mid, true)
    assert(cInc.receive(2000).size + cInc.receive(200).size +
      { var n = 0; var b = cInc.receive(200); while (b.nonEmpty) { n += b.size; b = cInc.receive(200) }; n }
      === all.length - all.length / 2)
  }

  test("closing the client closes its producers and consumers (reference child lifecycle)") {
    val c2 = new GraftRawdataClient(spark, Topic.tempDir("client-children"))
    val p = c2.producer("t")
    val cons = c2.consumer("t")
    assert(!p.isClosed && !cons.isClosed)
    c2.close()
    assert(p.isClosed && cons.isClosed)
    intercept[IllegalStateException](p.publish(EventsAsTopic.messagesFromEvents(spark, sf).limit(1)))
    intercept[IllegalStateException](cons.receive(10))
    // closing a child directly is independent and idempotent
    val c3 = new GraftRawdataClient(spark, Topic.tempDir("client-children2"))
    val p3 = c3.producer("t")
    p3.close(); p3.close()
    assert(p3.isClosed && !c3.isClosed)
    c3.close()
  }

  test("close() flips isClosed, is idempotent, and fails fast on use-after-close") {
    // a separate client instance — the shared one stays open for the
    // other tests in this suite
    val c = new GraftRawdataClient(spark, Topic.tempDir("client-close"))
    assert(!c.isClosed)
    val consumer = c.consumer("t") // pre-close handles keep working below
    c.close()
    assert(c.isClosed)
    c.close() // idempotent, like reference AvroRawdataClient close()
    assert(c.isClosed)
    intercept[IllegalStateException](c.producer("t"))
    intercept[IllegalStateException](c.consumer("t"))
    intercept[IllegalStateException](c.metadata("t"))
    intercept[IllegalStateException](c.lastMessage("t"))
    intercept[IllegalStateException](c.cursorOf("t", "p", 0L, 1L))
    // a consumer obtained before close() still reads (empty topic here) —
    // reference semantics close the client's resource handles, not
    // already-materialized DataFrames
    assert(consumer.messages.count() === 0)
  }

  private def Tables_eventsCount: Long = graft.Tables.events(spark, sf).count()
}
