package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming transition-matrix gate must agree with the batch unroll
  * after draining: the merged per-user final matrices equal batch
  * ev_markov's transition counts exactly, and the 8-step integer
  * forecast over them is value-identical to batch ev_stationary. The
  * feed honors the gate's ordering contract (per-user in-order across
  * micro-batches — the topic engine's per-group delivery guarantee) by
  * splitting on a timestamp midpoint: every first-half event precedes
  * every second-half event in (ts_us, event_id) order for any user.
  */
class StreamStationarySpec extends SparkSpec {
  import spark.implicits._

  test("drained stream == batch: transition matrix AND 8-step forecast") {
    val dir = graft.rawdata.Topic.tempDir("stream-stationary")
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val (lo, hi) = events
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val mid = (lo + hi) / 2

    // phase 1 on disk before the stream starts; phase 2 lands after the
    // first drain, so cross-batch state genuinely carries
    events.filter(unix_micros($"ts") < mid).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StationaryStream.transitions(StationaryStream.fromEvents(stream))
      .writeStream.format("memory").queryName("statgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val midRows = spark.sql("SELECT COUNT(*) FROM statgate").head().getLong(0)
      assert(midRows > 0, "no mid-stream emission")
      events.filter(unix_micros($"ts") >= mid).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()

      val all = spark.sql("SELECT user_id, n_trans, froms, tos, ns FROM statgate")
        .as[(Long, Long, Seq[String], Seq[String], Seq[Long])].collect()
      assert(all.length > midRows, "second micro-batch emitted nothing")
      // final emission per user = the row carrying its max n_trans
      val fin = all.groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }
      val merged = mutable.HashMap.empty[(String, String), Long]
      fin.foreach { case (_, _, fs, ts2, ns) =>
        fs.indices.foreach { i =>
          val k = (fs(i), ts2(i))
          merged.update(k, merged.getOrElse(k, 0L) + ns(i))
        }
      }

      // the merged matrix == the batch lead-window transition counts
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val batchCounts = events
        .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"), $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type", $"to_type").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap
      assert(merged.toMap === batchCounts, "streamed transition matrix diverged")

      // cross-batch carry was real: at least one user transitioned
      // ACROSS the midpoint (its matrix needs the phase-1 last event)
      val straddlers = events
        .groupBy($"user_id")
        .agg(min(unix_micros($"ts")).as("a"), max(unix_micros($"ts")).as("b"))
        .filter($"a" < mid && $"b" >= mid).count()
      assert(straddlers > 0, "no user straddles the split — fixture too weak")

      // the 8-step exact-integer forecast == the registered batch query
      val got = StationaryStream.forecastPpm(
        merged.toSeq.map { case ((a, b), n) => (a, b, n) })
      val want = graft.SparkEntry.queries("ev_stationary")(spark, sf)
        .as[(String, Long)].collect().toMap
      assert(got === want, s"forecast drift: $got vs $want")
    } finally q.stop()
  }
}
