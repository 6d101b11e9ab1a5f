package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming first-touch gate must agree with batch ev_first_touch
  * after draining: final per-user (first_type, purchased) identical to
  * the batch window's pick, and the channel table aggregated from the
  * final emissions identical to the registered query — across a
  * micro-batch split that deliberately delivers many users' EARLIEST
  * event in the SECOND batch (the order-independence claim under test).
  */
class StreamFirstTouchSpec extends SparkSpec {
  import spark.implicits._

  test("drained stream == batch ev_first_touch (per-user picks AND the channel table)") {
    val dir = graft.rawdata.Topic.tempDir("stream-firsttouch")
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    // parity split: roughly half of each user's events — including, for
    // about half the users, their true first event — arrive in batch 2
    events.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    events.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = FirstTouchStream.firstTouch(FirstTouchStream.fromEvents(stream))
      .writeStream.format("memory").queryName("ftgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val all = spark.sql("SELECT user_id, n, first_type, purchased FROM ftgate")
        .as[(Long, Long, String, Boolean)].collect()
      assert(all.nonEmpty)
      // final emission per user = the row carrying its max event count
      val fin = all.groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }

      // batch truth: the same deterministic (ts, event_id) first pick
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"), $"event_id")
      val truthFirst = events
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type").as[(Long, String)].collect().toMap
      val truthBuyers = events.filter($"event_type" === "purchase")
        .select($"user_id").distinct().as[Long].collect().toSet
      assert(fin.keySet == truthFirst.keySet, "user sets differ")
      fin.foreach { case (u, (_, _, ft, p)) =>
        assert(ft == truthFirst(u), s"user $u first touch: stream $ft vs batch ${truthFirst(u)}")
        assert(p == truthBuyers.contains(u), s"user $u purchased flag diverged")
      }

      // channel table over the final emissions == the registered query
      val n = fin.size.toLong
      val got = fin.values.groupBy(_._3).map { case (t, rows) =>
        val users = rows.size.toLong
        val buyers = rows.count(_._4).toLong
        (t, users, users * 1000000L / n, buyers, buyers * 1000000L / users)
      }.toSet
      val want = graft.SparkEntry.queries("ev_first_touch")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      spark.catalog.clearCache()
      assert(got == want, s"channel table drift:\n$got\nvs\n$want")
    } finally q.stop()
  }
}
