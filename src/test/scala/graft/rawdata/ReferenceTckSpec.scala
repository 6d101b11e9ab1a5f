package graft.rawdata

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The reference's OWN test suite, ported case-for-case: every @Test in
  * FilesystemAvroRawdataClientTck.java (cited by line) re-asserted
  * against the Spark-native facade. The only shape deviation:
  * receive(timeout) returns a (possibly multi-message) batch here, so
  * ordering asserts drain the consumer and compare sequences. Time-based
  * windowing is covered in BOTH modes: deterministic message-time
  * windows (explicit ULID timestamps) and the reference's wall-clock
  * max.seconds mode (TopicConfig.wallClockWindows, with the TCK's
  * Thread.sleep(1100) as a deterministic clock advance).
  * (cursorOf has both forms: the Option-returning Spark-idiomatic one
  * and cursorOfStrict with the reference's
  * RawdataNoSuchPositionException.)
  */
class ReferenceTckSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Topic.tempDir("tck")
  private lazy val client = new GraftRawdataClient(spark, base)

  /** explicit ULID: 48-bit ms timestamp + counter entropy (deterministic,
    * strictly increasing in n)
    */
  private val T0 = 1700000000000L
  private def ulidBytes(tsMs: Long, n: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 6) { b(i) = ((tsMs >> (8 * (5 - i))) & 0xff).toByte; i += 1 }
    var j = 0
    while (j < 8) { b(15 - j) = ((n >> (8 * j)) & 0xff).toByte; j += 1 }
    b
  }
  private def hex(id: Array[Byte]): String = id.map("%02x".format(_)).mkString

  private def msg(n: Long, pos: String, data: (String, Array[Byte])*): RawdataMessage =
    RawdataMessage(ulidBytes(T0 + n, n), Some("og1"), 1L, pos, data.toMap)
  private def msgAt(tsMs: Long, n: Long, pos: String, data: (String, Array[Byte])*): RawdataMessage =
    RawdataMessage(ulidBytes(tsMs, n), Some("og1"), 1L, pos, data.toMap)
  private def pay(sizes: Int*): Seq[(String, Array[Byte])] =
    sizes.zipWithIndex.map { case (sz, i) => s"payload${i + 1}" -> new Array[Byte](sz) }
  private def df(ms: RawdataMessage*): DataFrame = spark.createDataset(ms.toSeq).toDF()

  private def drain(c: client.Consumer, timeoutMs: Long = 2000): Seq[RawdataMessage] =
    Iterator.continually(c.receive(timeoutMs)).takeWhile(_.nonEmpty).flatten.toSeq

  // Tck.java:71 thatLastPositionOfEmptyTopicCanBeRead
  test("last position of an empty topic reads as absent") {
    assert(client.lastMessage("tck-empty").isEmpty)
  }

  // Tck.java:76 thatLastPositionOfProducerCanBeRead
  test("last position advances across producer sessions") {
    client.producer("tck-last").publish(df(
      msg(1, "a", pay(5, 5): _*), msg(2, "b", pay(3, 3): _*)))
    assert(client.lastMessage("tck-last").map(_.position).contains("b"))
    Topic.invalidateListing(client.topicDir("tck-last"))
    client.producer("tck-last").publish(df(msg(3, "c", pay(7, 7): _*)))
    assert(client.lastMessage("tck-last").map(_.position).contains("c"))
  }

  // Tck.java:94 thatAllFieldsOfMessageSurvivesStream
  test("every message field survives the produce/consume round-trip") {
    val a = msg(10, "a", "payload1" -> Array[Byte](1, 2, 3), "payload2" -> new Array[Byte](7))
    val b = msg(11, "b", "payload1" -> new Array[Byte](4), "payload2" -> new Array[Byte](8))
    val c = msg(12, "c", "payload1" -> new Array[Byte](2), "payload2" -> new Array[Byte](5))
    client.producer("tck-fields").publish(df(a, b, c))
    val got = drain(client.consumer("tck-fields", hex(a.id), inclusive = true))
    assert(got.map(_.position) === Seq("a", "b", "c"))
    got.zip(Seq(a, b, c)).foreach { case (m, want) =>
      assert(m.id.toSeq === want.id.toSeq)
      assert(m.orderingGroup === Some("og1"))
      assert(m.sequenceNumber === 1L)
      assert(m.data.keySet === want.data.keySet)
      want.data.foreach { case (k, v) => assert(m.data(k).toSeq === v.toSeq) }
    }
  }

  // Tck.java:139 thatSingleMessageCanBeProducedAndConsumerSynchronously
  test("a single message round-trips on a nested topic name") {
    client.producer("a/b/c").publish(df(msg(20, "a", pay(5, 5): _*)))
    val got = drain(client.consumer("a/b/c"))
    assert(got.map(_.position) === Seq("a"))
    assert(got.head.data.size === 2)
  }

  // Tck.java:152 thatSingleMessageCanBeProducedAndConsumerAsynchronously
  test("async receive joins with the published message") {
    client.producer("tck-async").publish(df(msg(30, "a", pay(5, 5): _*)))
    val got = client.consumer("tck-async").receiveAsync(2000).join()
    assert(got.map(_.position) === Seq("a"))
  }

  // Tck.java:168/:188 multiple messages, sync + async
  test("multiple messages arrive in publish (ULID) order, sync and async") {
    client.producer("tck-multi").publish(df(
      msg(40, "a", pay(5, 5): _*), msg(41, "b", pay(3, 3): _*), msg(42, "c", pay(7, 7): _*)))
    assert(drain(client.consumer("tck-multi")).map(_.position) === Seq("a", "b", "c"))
    assert(client.consumer("tck-multi").receiveAsync(2000).join().map(_.position)
      === Seq("a", "b", "c"))
  }

  // Tck.java:220 thatMessagesCanBeConsumedByMultipleConsumers
  test("independent consumers each see the full stream") {
    client.producer("tck-two").publish(df(
      msg(50, "a", pay(5, 5): _*), msg(51, "b", pay(3, 3): _*), msg(52, "c", pay(7, 7): _*)))
    val c1 = client.consumer("tck-two")
    val c2 = client.consumer("tck-two")
    assert(drain(c1).map(_.position) === Seq("a", "b", "c"))
    assert(drain(c2).map(_.position) === Seq("a", "b", "c"))
  }

  // Tck.java:245-327 read from beginning / first / middle / before-last / last
  test("position cursors resume from beginning, middle and end exactly") {
    val ms = Seq(msg(60, "a", pay(5, 5): _*), msg(61, "b", pay(3, 3): _*),
      msg(62, "c", pay(7, 7): _*), msg(63, "d", pay(7, 7): _*))
    client.producer("tck-seek").publish(df(ms: _*))
    val now = T0 + 100
    val tol = 1000L
    def from(pos: String, inclusive: Boolean) = {
      val cur = client.cursorOf("tck-seek", pos, now, tol)
      assert(cur.isDefined, s"cursorOf($pos)")
      drain(client.consumer("tck-seek", cur.get, inclusive)).map(_.position)
    }
    assert(drain(client.consumer("tck-seek")).map(_.position) === Seq("a", "b", "c", "d"))
    assert(from("a", inclusive = false) === Seq("b", "c", "d")) // :261 from first
    assert(from("b", inclusive = false) === Seq("c", "d")) // :277 from middle
    assert(from("c", inclusive = true) === Seq("c", "d")) // :277 inclusive form
    assert(from("c", inclusive = false) === Seq("d")) // :297 right before last
    assert(from("d", inclusive = false) === Seq.empty) // :313 from last
  }

  // Tck.java:329 thatSeekToWorks
  test("seek(timestamp) repositions to each message boundary") {
    val ms = Seq(msgAt(T0, 70, "a", pay(5, 5): _*), msgAt(T0 + 10, 71, "b", pay(3, 3): _*),
      msgAt(T0 + 20, 72, "c", pay(7, 7): _*), msgAt(T0 + 30, 73, "d", pay(7, 7): _*))
    client.producer("tck-ts").publish(df(ms: _*))
    val c = client.consumer("tck-ts")
    def firstAt(ts: Long): Option[String] =
      c.seek(ts).orderBy($"ulid_hex").select($"position").as[String].collect().headOption
    assert(firstAt(T0 + 31).isEmpty)
    assert(firstAt(T0 + 25).contains("d"))
    assert(firstAt(T0 + 5).contains("b"))
    assert(firstAt(T0 + 15).contains("c"))
    assert(firstAt(T0 - 5).contains("a"))
  }

  // Tck.java:365/:379/:391 cursorOf valid / invalid / empty topic
  test("cursorOf finds every real position and rejects missing ones") {
    client.producer("tck-cur").publish(df(
      msg(80, "a", pay(5, 5): _*), msg(81, "b", pay(3, 3): _*), msg(82, "c", pay(7, 7): _*)))
    val now = T0 + 100
    Seq("a", "b", "c").foreach(p => assert(client.cursorOf("tck-cur", p, now, 1000).isDefined))
    // Option form returns None; the strict form throws the reference's
    // typed exception (AvroRawdataClient.java:89-115)
    assert(client.cursorOf("tck-cur", "d", now, 1000).isEmpty)
    assert(client.cursorOf("tck-cur-empty", "d", now, 1000).isEmpty)
    intercept[RawdataNoSuchPositionException] {
      client.cursorOfStrict("tck-cur", "d", now, 1000)
    }
    intercept[RawdataNoSuchPositionException] {
      client.cursorOfStrict("tck-cur-empty", "d", now, 1000)
    }
    assert(client.cursorOfStrict("tck-cur", "a", now, 1000) ===
      client.cursorOf("tck-cur", "a", now, 1000).get)
  }

  // Tck.java:398 thatMultipleGCSFilesCanBeProducedAndReadBack
  test("messages across many producer sessions read back in global order") {
    val batches = Seq(Seq("a", "b", "c"), Seq("d", "e", "f"), Seq("g", "h", "i"))
    batches.zipWithIndex.foreach { case (ps, i) =>
      client.producer("tck-files").publish(df(ps.zipWithIndex.map { case (p, j) =>
        msg(90 + 10 * i + j, p, pay(5, 5): _*) }: _*))
      Topic.invalidateListing(client.topicDir("tck-files"))
    }
    assert(Topic.listFiles(client.topicDir("tck-files")).length >= 3)
    assert(drain(client.consumer("tck-files")).map(_.position)
      === Seq("a", "b", "c", "d", "e", "f", "g", "h", "i"))
  }

  // Tck.java:438 size-based windowing
  test("size-based windowing splits files and preserves order and content") {
    val cfg = TopicConfig(maxWindowMs = Long.MaxValue / 4, maxBytes = 2 * 1024,
      syncIntervalBytes = 200)
    val ms = (0 until 100).map { i =>
      msgAt(T0 + i, 200 + i, s"a$i",
        "attribute-1" -> s"a${i}_".getBytes("UTF-8"),
        "payload" -> ("ABC_" * i).getBytes("UTF-8"))
    }
    client.producer("tck-size", cfg).publish(df(ms: _*))
    assert(Topic.listFiles(client.topicDir("tck-size")).length > 1, "2 KiB roll splits files")
    val got = drain(client.consumer("tck-size"))
    assert(got.map(_.position) === (0 until 100).map(i => s"a$i"))
    got.zipWithIndex.foreach { case (m, i) =>
      assert(new String(m.data("attribute-1"), "UTF-8") === s"a${i}_")
      assert(new String(m.data("payload"), "UTF-8") === "ABC_" * i)
    }
  }

  // Tck.java:462 time-based windowing — deterministic message-time mode
  test("time-based windowing splits files on the message timeline") {
    val cfg = TopicConfig(maxWindowMs = 2000, maxBytes = Long.MaxValue / 4,
      syncIntervalBytes = 64 * 1024)
    val ms = (0 until 3).map(i =>
      msgAt(T0 + 1100L * i, 300 + i, s"a$i", "attribute-1" -> s"a$i".getBytes("UTF-8")))
    client.producer("tck-time", cfg).publish(df(ms: _*))
    assert(Topic.listFiles(client.topicDir("tck-time")).length >= 2)
    val got = drain(client.consumer("tck-time"))
    assert(got.map(_.position) === Seq("a0", "a1", "a2"))
  }

  // Tck.java:462 time-based windowing — the reference's WALL-CLOCK
  // max.seconds mode, ported faithfully: publish / sleep(1100) / publish
  // with maxWindowMs=1000, except the sleep is a deterministic clock
  // advance. Each elapsed window rolls the producer's open file; close
  // lands the last one; every message survives in order.
  test("wall-clock windowing rolls the open file on elapsed producer time") {
    var now = T0
    val cfg = TopicConfig(maxWindowMs = 1000, maxBytes = Long.MaxValue / 4,
      syncIntervalBytes = 64 * 1024, wallClockWindows = true)
    val p = client.producer("tck-wallclock", cfg, () => now)
    val landed = Seq.newBuilder[TopicFile]
    for (i <- 0 until 3) {
      p.buffer(msgAt(T0 + i, 330 + i, s"a$i", "attribute-1" -> s"a$i".getBytes("UTF-8")))
      landed ++= p.publish(s"a$i")
      // a published-but-unrolled message is NOT yet visible (the
      // reference's open file is unreadable until uploaded)
      if (i < 2) now += 1100
    }
    assert(landed.result().length === 2, "two elapsed windows rolled two files")
    p.close()
    assert(Topic.listFiles(client.topicDir("tck-wallclock")).length === 3,
      "close lands the open file: 3 single-message files like the reference TCK")
    val got = drain(client.consumer("tck-wallclock"))
    assert(got.map(_.position) === Seq("a0", "a1", "a2"))
    got.zipWithIndex.foreach { case (m, i) =>
      assert(new String(m.data("attribute-1"), "UTF-8") === s"a$i")
    }
  }

  // wall-clock mode also rolls on max.bytes inside a window, and close()
  // is idempotent with nothing open
  test("wall-clock windowing still rolls on the byte budget") {
    var now = T0
    val cfg = TopicConfig(maxWindowMs = Long.MaxValue / 4, maxBytes = 300,
      syncIntervalBytes = 64 * 1024, wallClockWindows = true)
    val p = client.producer("tck-wallbytes", cfg, () => now)
    val landed = (0 until 4).flatMap { i =>
      p.buffer(msgAt(T0 + i, 340 + i, s"b$i", "payload" -> new Array[Byte](150)))
      p.publish(s"b$i")
    }
    assert(landed.nonEmpty, "byte budget must roll at least one file before close")
    p.close()
    p.close() // idempotent
    val got = drain(client.consumer("tck-wallbytes"))
    assert(got.map(_.position) === (0 until 4).map(i => s"b$i"))
  }

  // Tck.java:489 thatFilesCreatedAfterConsumerHasSubscribedAreUsed
  test("files landing after subscription are delivered by the poll loop") {
    client.producer("tck-late").publish(df(
      msg(310, "a", pay(5, 5): _*), msg(311, "b", pay(3, 3): _*)))
    val consumer = client.consumer("tck-late", pollIntervalMs = 50)
    val first = consumer.receive(2000)
    assert(first.map(_.position) === Seq("a", "b"))
    java.util.concurrent.CompletableFuture.runAsync { () =>
      Thread.sleep(300)
      client.producer("tck-late").publish(df(msg(312, "c", pay(7, 7): _*)))
      Topic.invalidateListing(client.topicDir("tck-late"))
    }
    val late = consumer.receive(10000)
    assert(late.map(_.position) === Seq("c"))
  }

  // Tck.java:538 thatNonExistentStreamCanBeConsumedFirstAndProducedAfter
  test("a not-yet-existing topic can be subscribed before it is produced") {
    val consumer = client.consumer("tck-preborn", pollIntervalMs = 50)
    java.util.concurrent.CompletableFuture.runAsync { () =>
      Thread.sleep(300)
      client.producer("tck-preborn").publish(df(
        msg(320, "a", pay(5, 5): _*), msg(321, "b", pay(3, 3): _*)))
    }
    val got = consumer.receive(10000)
    assert(got.map(_.position) === Seq("a", "b"))
    assert(consumer.receive(100).isEmpty)
  }

  // Tck.java:577/:595 lastMessage with multiple / single Avro blocks
  test("lastMessage seeks the final block via the filename offset") {
    val cfg = TopicConfig(maxWindowMs = Long.MaxValue / 4, maxBytes = Long.MaxValue / 4,
      syncIntervalBytes = 200)
    val ms = ('a' to 'i').zipWithIndex.map { case (p, i) =>
      msg(330 + i, p.toString, pay(50 + 10 * (i % 3), 50 + 10 * (i % 3)): _*) }
    client.producer("tck-blocks", cfg).publish(df(ms: _*))
    assert(client.lastMessage("tck-blocks").map(_.position).contains("i"))
    client.producer("tck-single", cfg).publish(df(msg(340, "a", pay(50, 50): _*)))
    assert(client.lastMessage("tck-single").map(_.position).contains("a"))
  }

  // Tck.java:605 thatMetadataCanBeWrittenListedAndRead
  test("metadata round-trips hostile keys, overwrites and removes") {
    val md = client.metadata("tck-meta")
    assert(md.topicName === "tck-meta")
    assert(md.keys.isEmpty)
    val key1 = "//./key-1'§!#$%&/()=?"
    val key2 = "."
    val key3 = ".."
    md.put(key1, "Value-1".getBytes("UTF-8"))
    md.put(key2, "Value-2".getBytes("UTF-8"))
    md.put(key3, "Value-3".getBytes("UTF-8"))
    assert(md.keys.size === 3)
    assert(new String(md.get(key1).get, "UTF-8") === "Value-1")
    assert(new String(md.get(key2).get, "UTF-8") === "Value-2")
    md.put(key2, "Overwritten-Value-2".getBytes("UTF-8"))
    assert(md.keys.size === 3)
    assert(new String(md.get(key2).get, "UTF-8") === "Overwritten-Value-2")
    md.remove(key3)
    assert(md.keys.size === 2)
    assert(md.get(key3).isEmpty)
  }

  // rawdata API two-phase contract: buffer(builder...) stages by
  // position, publish(positions...) emits exactly those (the reference's
  // per-position producer protocol every migration call site uses first)
  test("buffer then publish(positions) emits exactly the named positions") {
    val p = client.producer("tck-buf")
    p.buffer(msg(300, "a", pay(5, 5): _*), msg(301, "b", pay(3, 3): _*),
      msg(302, "c", pay(7, 7): _*))
    assert(p.bufferedPositions === Seq("a", "b", "c"))
    p.publish("a", "c")
    assert(p.bufferedPositions === Seq("b"))
    assert(drain(client.consumer("tck-buf")).map(_.position) === Seq("a", "c"))
    Topic.invalidateListing(client.topicDir("tck-buf"))
    p.publish("b")
    assert(p.bufferedPositions.isEmpty)
    assert(drain(client.consumer("tck-buf")).map(_.position) === Seq("a", "b", "c"))
  }

  // rawdata API RawdataNotBufferedException: naming an unbuffered
  // position fails loudly BEFORE anything is written
  test("publishing an unbuffered position fails loudly without writing") {
    val p = client.producer("tck-nobuf")
    p.buffer(msg(310, "a", pay(5, 5): _*))
    intercept[RawdataNotBufferedException] { p.publish("a", "ghost") }
    // nothing was published and the staged message survived
    assert(client.lastMessage("tck-nobuf").isEmpty)
    assert(p.bufferedPositions === Seq("a"))
    // re-buffering a position overwrites in place (keyed buffer)
    p.buffer(msg(311, "a", pay(9, 9): _*))
    assert(p.bufferedPositions === Seq("a"))
    p.publish("a")
    val got = drain(client.consumer("tck-nobuf"))
    assert(got.map(_.position) === Seq("a"))
    assert(got.head.data("payload1").length === 9)
  }

  // reference RawdataClosedException (AvroRawdataProducer.java:206-208,
  // AvroRawdataClient.java:147-152): every surface fails fast after close
  test("closed client, producer and consumer throw RawdataClosedException") {
    val p = client.producer("tck-closed")
    val c = client.consumer("tck-closed")
    p.close()
    c.close()
    intercept[RawdataClosedException] { p.publish(df(msg(320, "a", pay(1): _*))) }
    intercept[RawdataClosedException] { p.buffer(msg(321, "b", pay(1): _*)) }
    intercept[RawdataClosedException] { p.publish("b") }
    intercept[RawdataClosedException] { c.receive(10) }
    val c2 = new GraftRawdataClient(spark, base)
    c2.close()
    intercept[RawdataClosedException] { c2.producer("x") }
    intercept[RawdataClosedException] { c2.consumer("x") }
    intercept[RawdataClosedException] { c2.metadata("x") }
    intercept[RawdataClosedException] { c2.lastMessage("x") }
  }
}
