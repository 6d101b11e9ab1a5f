package graft.rawdata

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec

/** Object-store failure modes, emulated through [[FaultyFileSystem]]
  * (`faulty:` scheme over the local store), proving the consumer surface
  * stays exactly-once:
  *
  *  - a LISTING that lags file visibility (the GCS eventual-LIST quirk
  *    the reference's TopicAvroFileCache min-interval refresh sits on
  *    top of) delays delivery but never loses or duplicates a message;
  *  - a read channel that resets mid-file (the failure
  *    GCSSeekableInput.java's reopen handles) is absorbed by
  *    AvroCodec's reopen-and-skip retry — full reads, cursor reads and
  *    the last-block fast path all return exactly the committed data.
  */
class FaultInjectionSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  private def registerScheme(): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    if (hc.get("fs.faulty.impl") == null) {
      hc.set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
      hc.setBoolean("fs.faulty.impl.disable.cache", true)
      HadoopIO.invalidateConfCache()
    }
  }

  override def beforeEach(): Unit = { registerScheme(); FaultyFileSystem.reset() }
  override def afterEach(): Unit = FaultyFileSystem.reset()

  private def msgs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.toDF("i").select(
      Ulid.deterministic(lit(1700000000000L) + $"i" * 1000L,
        concat(lit("p"), $"i")).as("id"),
      lit(null).cast("string").as("orderingGroup"),
      $"i".cast("long").as("sequenceNumber"),
      concat(lit("pos-"), $"i").as("position"),
      map(lit("payload"), encode(concat(lit("data-"), $"i"), "UTF-8")).as("data"))

  test("stale listings delay delivery but never lose or duplicate messages") {
    val dir = "faulty:" + Topic.tempDir("fault-stale")
    val client = new GraftRawdataClient(spark, dir.stripSuffix("/"))
    // no lag yet: first batch publishes and consumes normally
    val p = client.producer("t", TopicConfig(maxWindowMs = 5000L))
    p.publish(msgs(0 until 40))
    val consumer = client.consumer("t", 20L)
    val batch1 = Iterator.continually(consumer.receive(2000L))
      .takeWhile(_.nonEmpty).flatten.toSeq
    assert(batch1.size === 40)

    // now every NEW file is invisible to listings for 1.5 s
    FaultyFileSystem.visibilityLagMs = 1500L
    p.publish(msgs(40 until 80))
    // a poll shorter than the lag sees a stale listing: nothing arrives
    val early = consumer.receive(300L)
    assert(early.isEmpty, "stale listing must hide the new files at first")
    assert(FaultyFileSystem.suppressedListings.get() > 0,
      "staleness was never exercised")
    // but polling THROUGH the lag delivers everything exactly once
    val batch2 = Iterator.continually(consumer.receive(3000L))
      .takeWhile(_.nonEmpty).flatten.toSeq
    val all = (batch1 ++ batch2).map(_.position)
    assert(all.sorted === (0 until 80).map(i => s"pos-$i").sorted)
    assert(all.distinct.size === all.size, "a message was delivered twice")
    client.close()
  }

  test("injected read-channel resets are absorbed: reads stay exactly-once") {
    val dir = "faulty:" + Topic.tempDir("fault-reset")
    // several files so several independent resets are injected
    Topic.write(msgs(0 until 60), dir, TopicConfig(maxWindowMs = 5000L))
    val files = Topic.listFiles(dir)
    assert(files.size >= 3)

    FaultyFileSystem.injectReadFaults = true
    // full distributed read: every file's first read call throws once
    val got = Topic.read(spark, dir).collect().map(_.position).toSeq
    assert(FaultyFileSystem.injectedResets.get() >= files.size,
      "resets were never exercised")
    assert(got.sorted === (0 until 60).map(i => s"pos-$i").sorted)
    assert(got.distinct.size === got.size, "a record was re-delivered after a reset")

    // the last-block fast path (seek + read) also survives a reset
    FaultyFileSystem.reset()
    FaultyFileSystem.injectReadFaults = true
    val last = Topic.lastMessage(dir)
    assert(last.map(_.position) === Some("pos-59"))
    assert(FaultyFileSystem.injectedResets.get() > 0)
  }

  test("a cursor resume through both faults at once misses nothing") {
    val dir = "faulty:" + Topic.tempDir("fault-both")
    val client = new GraftRawdataClient(spark, dir.stripSuffix("/"))
    val p = client.producer("t", TopicConfig(maxWindowMs = 5000L))
    p.publish(msgs(0 until 30))
    val c1 = client.consumer("t", 20L)
    val first = Iterator.continually(c1.receive(2000L))
      .takeWhile(_.nonEmpty).flatten.toSeq
    val cursor = c1.position.get

    FaultyFileSystem.visibilityLagMs = 1200L
    FaultyFileSystem.injectReadFaults = true
    p.publish(msgs(30 until 60))
    val c2 = client.consumer("t", cursor, inclusive = false)
    val resumed = Iterator.continually(c2.receive(3000L))
      .takeWhile(_.nonEmpty).flatten.toSeq
    val all = (first ++ resumed).map(_.position)
    assert(all.sorted === (0 until 60).map(i => s"pos-$i").sorted)
    assert(all.distinct.size === all.size)
    client.close()
  }
}
