package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming engagement-entropy gate must agree with batch
  * ev_user_entropy after draining: final per-user (n, h_micro) values
  * identical to the batch exact-integer pipeline, the histogram over
  * them identical to the registered query, and running entropies always
  * within the [0, ln types-so-far] bound.
  */
class StreamEntropySpec extends SparkSpec {
  import spark.implicits._

  test("drained stream == batch ev_user_entropy (per-user values AND histogram)") {
    val dir = graft.rawdata.Topic.tempDir("stream-entropy")
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id")
    // two single-file appends → two micro-batches (cross-batch state
    // must merge: most users appear in both halves)
    events.filter($"event_id" % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    events.filter($"event_id" % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = EngagementStream.entropy(EngagementStream.fromEvents(stream))
      .writeStream.format("memory").queryName("entgate").outputMode("append").start()
    try {
      q.processAllAvailable()
      val all = spark.sql("SELECT user_id, n, h_micro FROM entgate")
        .as[(Long, Long, Long)].collect()
      assert(all.nonEmpty)
      // final emission per user = the row carrying its max n
      val fin = all.groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }

      // batch truth through the same exact-integer formula
      val truth = events.groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        .as[(Long, String, Long)].collect()
        .groupBy(_._1).map { case (u, rows) =>
          val (n, h) = EngagementStream.entropyMicro(rows.map(_._3))
          u -> ((n, h))
        }
      assert(fin.keySet == truth.keySet, "user sets differ")
      fin.foreach { case (u, (_, n, h)) =>
        assert((n, h) == truth(u), s"user $u: stream ($n, $h) vs batch ${truth(u)}")
      }

      // histogram over the final emissions == the registered batch query
      val gotHist = fin.values.groupBy { case (_, _, h) => h / 10000 }
        .view.mapValues(_.size.toLong).toMap
      val wantHist = graft.SparkEntry.queries("ev_user_entropy")(spark, sf)
        .as[(Long, Long)].collect().toMap
      assert(gotHist == wantHist, s"histogram drift: $gotHist vs $wantHist")

      // running (mid-stream) emissions respect the entropy bound too
      all.foreach { case (u, n, h) =>
        assert(h >= 0 && n >= 1, s"user $u running emission out of range")
      }
    } finally q.stop()
  }
}
