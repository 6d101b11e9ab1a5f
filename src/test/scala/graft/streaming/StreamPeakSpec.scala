package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.EventQueries

/** The streaming peak gate's final emission (per type, after all files
  * replay in forced one-file micro-batches) must equal the batch
  * ev_peak's value-RANGE window answer on the same rows — including the
  * earliest-peak-minute tie-break — and the per-batch emissions must be
  * monotone (a trailing-hour peak can only grow as history accumulates).
  */
class StreamPeakSpec extends SparkSpec {
  import spark.implicits._

  test("final streamed peaks equal batch ev_peak; running peaks are monotone per type") {
    val dir = graft.rawdata.Topic.tempDir("stream-peak")
    // several parquet files so maxFilesPerTrigger=1 forces real
    // cross-batch state merging (event-time order NOT preserved
    // across batches — the merge must not care)
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = PeakStream.peaks(PeakStream.fromEvents(stream))
      .writeStream.format("memory").queryName("peaks")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val emitted = spark.sql(
        "SELECT event_type, peak_events, peak_minute, n_active_minutes, n_events_seen FROM peaks")
        .as[(String, Long, Long, Long, Long)].collect()
      assert(emitted.nonEmpty)
      // monotone growth: ordering emissions by events-seen, the peak
      // never decreases within a type
      for ((_, es) <- emitted.groupBy(_._1)) {
        val byProgress = es.sortBy(_._5).map(_._2)
        assert(byProgress.zip(byProgress.tail).forall { case (a, b) => a <= b })
      }
      // the final emission per type (max events seen) is the batch answer
      val fin = emitted.groupBy(_._1).view.mapValues(_.maxBy(_._5)).toMap
      val batch = EventQueries.queries("ev_peak")(spark, sf).collect()
      assert(batch.map(_.getAs[String]("event_type")).toSet === fin.keySet)
      for (b <- batch) {
        val f = fin(b.getAs[String]("event_type"))
        assert(f._2 === b.getAs[Long]("peak_events"))
        assert(f._3 === b.getAs[Long]("peak_minute"))
        assert(f._4 === b.getAs[Long]("n_active_minutes"))
      }
      // and the event mass is conserved
      assert(fin.values.map(_._5).sum === Tables.events(spark, sf).count())
    } finally q.stop()
  }
}
