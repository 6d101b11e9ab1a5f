package graft.rawdata

import graft.SparkSpec

/** Reference-surface parity beyond the core client: ServiceLoader
  * provider registration, async produce/consume variants, and the
  * per-producer monotonic ULID discipline.
  */
class ProviderSpec extends SparkSpec {

  test("the provider is discoverable through ServiceLoader and builds a working client") {
    val ps = RawdataClientFactory.providers()
    assert(ps.map(_.providerId) === Seq("graft-spark"))
    assert(ps.head.configurationKeys.contains("base-dir"))
    spark.sparkContext // force session init so getActiveSession resolves
    val client = RawdataClientFactory.create("graft-spark", Map(
      "base-dir" -> Topic.tempDir("provider-spec"),
      "avro-file.max.seconds" -> "3600",
      "avro-file.max.bytes" -> (16 * 1024 * 1024).toString,
      "avro-file.sync.interval" -> (512 * 1024).toString,
      "listing.min-interval-seconds" -> "1"))
    val msgs = EventsAsTopic.messagesFromEvents(spark, sf).limit(50)
    // producer() with no explicit cfg: uses the provider-configured rolling
    assert(client.producer("t").publish(msgs).nonEmpty)
    assert(client.consumer("t").messages.count() === 50)
    client.close()
    assert(client.isClosed)
  }

  test("unknown provider id fails with the available ids listed") {
    val e = intercept[IllegalArgumentException](
      RawdataClientFactory.create("gcs", Map.empty))
    assert(e.getMessage.contains("graft-spark"))
  }

  test("publishAsync/receiveAsync complete with the blocking results") {
    val client = new GraftRawdataClient(spark, Topic.tempDir("async-spec"))
    val msgs = EventsAsTopic.messagesFromEvents(spark, sf).limit(30)
    // start the bounded receive BEFORE the publish lands: the future must
    // see the files the async publish creates (poll-loop semantics)
    val consumer = client.consumer("t", 50)
    val rx = consumer.receiveAsync(30000)
    val metas = client.producer("t", EventsAsTopic.cfg).publishAsync(msgs)
      .get(60, java.util.concurrent.TimeUnit.SECONDS)
    assert(metas.map(_.count).sum === 30)
    // a distributed publish lands files as tasks finish, so the first
    // batch may be partial — drain the same consumer until all arrive
    var received = rx.get(60, java.util.concurrent.TimeUnit.SECONDS)
    assert(received.nonEmpty)
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (received.size < 30 && System.nanoTime() < deadline)
      received ++= consumer.receive(2000)
    assert(received.size === 30)
    // each batch delivered in ULID order, like the reference's receive loop
    val hexes = received.map(_.id.map("%02x".format(_)).mkString)
    assert(hexes.distinct.size === 30)
  }

  test("monotonic ULIDs: strictly increasing under same-ms bursts, ts advances with the clock") {
    val gen = new Ulid.Monotonic(entropySeed = 42L)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    // burst: 1000 ids at a frozen millisecond
    val burst = (1 to 1000).map(_ => hex(gen.next(nowMs = 5000L)))
    assert(burst === burst.sorted)
    assert(burst.distinct.size === burst.size)
    assert(burst.forall(_.startsWith("000000001388"))) // ts stays 5000
    // clock advance: new timestamp prefix, still globally increasing
    val later = hex(gen.next(nowMs = 6000L))
    assert(later.startsWith("000000001770"))
    assert(later > burst.last)
    // clock going BACKWARDS must not break monotonicity (reference
    // nextMonotonicUlid increments prev when now <= prev ts)
    val backwards = hex(gen.next(nowMs = 4000L))
    assert(backwards > later)
  }
}
