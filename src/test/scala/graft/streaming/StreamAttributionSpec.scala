package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}
import graft.rawdata.{EventsAsTopic, Topic, Ulid}

/** The streaming last-touch gate must agree per-purchase with the batch
  * window logic, and its rollup must match the registered ev_attribution
  * query on the same data.
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("streaming attribution equals the batch window logic per purchase") {
    val dir = Topic.tempDir("stream-attrib")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf), dir, EventsAsTopic.cfg)

    val touches = TopicStream.messages(spark, dir).toDF()
      .select(
        decode(element_at($"data", "user"), "UTF-8").cast("long").as("userId"),
        $"sequenceNumber".as("eventId"),
        $"orderingGroup".as("eventType"),
        Ulid.timestampMs($"id").as("tsMs"))
      .as[Attribution.Touch]

    val q = Attribution.lastTouch(touches)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT eventId, attribType FROM attrib")
        .as[(Long, String)].collect().toMap

      // batch truth: the same ignore-nulls window pass ev_attribution uses,
      // kept at per-purchase grain instead of rolled up
      val w = Window.partitionBy($"user_id").orderBy(unix_millis($"ts"), $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val batch = Tables.events(spark, sf)
        .withColumn("last_touch",
          last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", coalesce($"last_touch", lit("none")))
        .as[(Long, String)].collect().toMap

      assert(streamed === batch)

      // and the rollup agrees with the registered query's counts
      val rolled = streamed.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val registered = SparkEntry.queries("ev_attribution")(spark, sf)
        .select($"attrib_type", $"n_purchases").as[(String, Long)].collect().toMap
      assert(rolled === registered)
    } finally q.stop()
  }
}
