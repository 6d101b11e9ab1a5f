package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming gap audit must reproduce rd_gap_detect's per-group gap
  * totals on a one-batch replay, keep its high-watermark across
  * micro-batches, and never report a gap inside an in-order stream.
  */
class StreamGapSpec extends SparkSpec {
  import spark.implicits._

  test("one-batch replay matches the batch rd_gap_detect totals") {
    val topicDir = graft.rawdata.EventsAsTopic.topicDir(spark, sf)
    val stream = TopicStream.messages(spark, topicDir).toDF()
    val q = TopicStream.gaps(stream)
      .writeStream.format("memory").queryName("gapaudit").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT orderingGroup, CAST(COUNT(*) AS BIGINT), CAST(SUM(missing) AS BIGINT) " +
            "FROM gapaudit GROUP BY 1")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val batch = graft.SparkEntry.queries("rd_gap_detect")(spark, sf)
        .as[(String, Long, Long)].collect()
        .filter(r => r._2 > 0)
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("state carries across micro-batches; in-order streams report nothing") {
    val dir = graft.rawdata.Topic.tempDir("stream-gap")
    // group g: seqs 1..5 then 8..10 split across two files → the gap
    // (6,7) straddles the micro-batch boundary and must still be caught
    Seq(1L, 2L, 3L, 4L, 5L).toDF("sequenceNumber")
      .withColumn("orderingGroup", lit("g"))
      .coalesce(1).write.mode("append").parquet(dir)
    Seq(8L, 9L, 10L).toDF("sequenceNumber")
      .withColumn("orderingGroup", lit("g"))
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = TopicStream.gaps(stream)
      .writeStream.format("memory").queryName("gapaudit2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val gaps = spark.sql("SELECT orderingGroup, fromSeq, missing FROM gapaudit2")
        .as[(String, Long, Long)].collect().toSeq
      assert(gaps === Seq(("g", 6L, 2L)))
    } finally q.stop()
  }
}
