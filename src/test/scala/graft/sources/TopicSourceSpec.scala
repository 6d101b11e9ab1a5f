package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rawdata.{EventsAsTopic, Topic}

/** The DataSource V2 topic connector must agree with the imperative read
  * path AND prove its planning-time behaviors: ts_ms predicates prune
  * files before any read, and column pruning reaches the decoder.
  */
class TopicSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Topic.tempDir("dsv2-topic")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf), d, EventsAsTopic.cfg)
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): TopicScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[TopicScan]

  test("format(graft-topic) returns exactly what Topic.readDF returns") {
    val viaSource = spark.read.format("graft-topic").load(dir)
      .select($"ulid_hex", $"position", $"sequenceNumber", $"ts_ms")
    val viaTopic = Topic.readDF(spark, dir)
      .select($"ulid_hex", $"position", $"sequenceNumber", $"ts_ms")
    assert(viaSource.collect().toSet === viaTopic.collect().toSet)
  }

  test("a ts_ms range predicate prunes files at plan time") {
    val files = Topic.listFiles(dir)
    assert(files.size > 3)
    val cut = files(files.size / 2).fromTsMs + 1
    val hi = files(files.size / 2 + 1).fromTsMs

    val df = spark.read.format("graft-topic").load(dir)
      .filter($"ts_ms" >= cut && $"ts_ms" <= hi)
    val parts = scanOf(df).planInputPartitions()
    assert(parts.length < files.size, "pruned scan must not read every file")
    assert(parts.length <= 3, s"±1-window bound expected, got ${parts.length} files")

    // and the answer still matches the unpruned/manual path
    val expected = Topic.readDF(spark, dir)
      .filter($"ts_ms" >= cut && $"ts_ms" <= hi)
      .select($"ulid_hex").as[String].collect().toSet
    assert(df.select($"ulid_hex").as[String].collect().toSet === expected)
  }

  test("column pruning reaches the reader (payload map not decoded)") {
    val df = spark.read.format("graft-topic").load(dir).select($"position")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq === Seq("position"))
    assert(df.distinct().count() === graft.Tables.events(spark, sf).count())
  }

  test("readStream tails the topic incrementally: new files become new micro-batches") {
    val sdir = Topic.tempDir("dsv2-stream")
    val all = EventsAsTopic.messagesFromEvents(spark, sf)
    val batch1 = all.filter($"sequenceNumber" <= 300)
    val batch2 = all.filter($"sequenceNumber" > 300 && $"sequenceNumber" <= 400)
    Topic.write(batch1, sdir, EventsAsTopic.cfg)
    val n1 = batch1.count()

    val q = spark.readStream.format("graft-topic").load(sdir)
      .select($"ulid_hex", $"position")
      .writeStream.format("memory").queryName("topic_tail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT COUNT(*) FROM topic_tail").as[Long].collect().head === n1)
      // a second publish lands new files; the SAME query picks them up
      Topic.write(batch2, sdir, EventsAsTopic.cfg)
      q.processAllAvailable()
      val rows = spark.sql("SELECT ulid_hex FROM topic_tail").as[String].collect()
      assert(rows.length === n1 + batch2.count())
      assert(rows.distinct.length === rows.length, "no duplicate deliveries within one run")
    } finally q.stop()
  }

  test("write path: df.write.format(graft-topic) round-trips a topic") {
    val dest = Topic.tempDir("dsv2-write")
    spark.read.format("graft-topic").load(dir)
      .write.format("graft-topic").mode("append").save(dest)
    val files = Topic.listFiles(dest)
    assert(files.nonEmpty)
    // filename metadata is real: counts sum to the message total, the
    // fromTimestamp of each file is its true first message (input was
    // ULID-sorted by the sink's required ordering)
    assert(files.map(_.count).sum === graft.Tables.events(spark, sf).count())
    val a = Topic.readDF(spark, dir).select($"ulid_hex", $"position", $"sequenceNumber")
    val b = Topic.readDF(spark, dest).select($"ulid_hex", $"position", $"sequenceNumber")
    assert(b.collect().toSet === a.collect().toSet)
    // the reference-format invariants hold on the sink's files too
    val f = files.head
    val msgs = graft.rawdata.AvroCodec.readFile(f.path, graft.rawdata.HadoopIO.conf()).toSeq
    val hexes = msgs.map(_.id.map("%02x".format(_)).mkString)
    assert(hexes === hexes.sorted, "within-file ULID order")
  }

  test("restart from checkpoint resumes exactly after delivered files (durable discovery log)") {
    val sdir = Topic.tempDir("dsv2-restart")
    val ckpt = Topic.tempDir("dsv2-restart-ckpt")
    val outDir = Topic.tempDir("dsv2-restart-out")
    val all = EventsAsTopic.messagesFromEvents(spark, sf)
    val batch1 = all.filter($"sequenceNumber" <= 200)
    val batch2 = all.filter($"sequenceNumber" > 200 && $"sequenceNumber" <= 300)
    Topic.write(batch1, sdir, EventsAsTopic.cfg)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-topic").load(sdir)
        .select($"ulid_hex", $"position")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce() // run 1 delivers batch1
    Topic.write(batch2, sdir, EventsAsTopic.cfg)
    runOnce() // run 2 (fresh query, same checkpoint) must deliver ONLY batch2

    val out = spark.read.parquet(outDir).select($"ulid_hex").as[String].collect()
    assert(out.length === batch1.count() + batch2.count(),
      "a restart must not re-deliver files committed by the previous run")
    assert(out.distinct.length === out.length, "no duplicate deliveries across restarts")
  }

  test("SQL over the connector: the seek query shape via plain spark.sql") {
    spark.read.format("graft-topic").load(dir).createOrReplaceTempView("topic_v")
    val mid = Topic.listFiles(dir)(Topic.listFiles(dir).size / 2).fromTsMs
    val n = spark.sql(s"SELECT COUNT(*) FROM topic_v WHERE ts_ms >= $mid").as[Long].collect().head
    val expected = Topic.seek(spark, dir, mid).count()
    assert(n === expected)
  }
}
