package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.RecQueries
import graft.rawdata.{Topic, TopicConfig, Ulid}

/** The streaming suggestion gate must serve exactly the batch neighbor
  * model: for every arriving purchase, the emitted (rnk, suggestion,
  * jaccard_ppm) rows are the purchased item's q44_item_sim entries —
  * nothing more (items with no qualifying neighbors emit nothing),
  * nothing less, verdict-identical on every event.
  */
class StreamRecSpec extends SparkSpec {
  import spark.implicits._

  test("streaming suggestions are id-identical to a batch join with the neighbor model") {
    val dir = Topic.tempDir("stream-rec")
    // purchase events: the (cust, part) pairs of the fact table, one
    // message each (deterministic ULIDs, seq = row index)
    val purchases = Tables.t(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(Tables.t(spark, sf, "lineitem").select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("cust"), $"l_partkey".as("part"))
      .withColumn("seq", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"cust", $"part")).cast("long"))
    val msgs = purchases.select(
      Ulid.deterministic(lit(1700000000000L) + $"seq" * 1000, $"seq").as("id"),
      lit("g").as("orderingGroup"),
      $"seq".as("sequenceNumber"),
      concat(lit("p-"), $"seq".cast("string")).as("position"),
      map(lit("cust"), encode($"cust".cast("string"), "UTF-8"),
        lit("part"), encode($"part".cast("string"), "UTF-8")).as("data"))
    Topic.write(msgs, dir, TopicConfig())

    val stream = TopicStream.messages(spark, dir).toDF()
      .select(
        decode(element_at($"data", "cust"), "UTF-8").cast("long").as("cust"),
        decode(element_at($"data", "part"), "UTF-8").cast("long").as("part"))

    val (gate, caches) = RecStream.suggestionsScoped(stream, sf)
    val q = gate.writeStream.format("memory").queryName("recs_gate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT cust, part, rnk, suggestion, jaccard_ppm FROM recs_gate")
        .as[(Long, Long, Long, Long, Long)].collect().sorted
      val batch = purchases.select($"cust", $"part")
        .join(RecQueries.itemNeighbors(spark, sf)
          .select($"a".as("part"), $"rnk", $"b".as("suggestion"), $"jaccard_ppm"),
          Seq("part"))
        .select($"cust", $"part", $"rnk", $"suggestion", $"jaccard_ppm")
        .as[(Long, Long, Long, Long, Long)].collect().sorted
      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq,
        "streamed suggestions differ from the batch model join")
    } finally {
      q.stop()
      caches.close()
      spark.sql("DROP TABLE IF EXISTS recs_gate")
    }
  }
}
