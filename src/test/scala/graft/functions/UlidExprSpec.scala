package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.rawdata.{EventsAsTopic, Ulid}

class UlidExprSpec extends SparkSpec {
  import spark.implicits._

  test("native ulid_ts_ms equals the builtin-composed decode on real ids") {
    val ids = EventsAsTopic.messagesFromEvents(spark, sf).select($"id")
    val diff = ids
      .select(Ulid.timestampMs($"id").as("native"), Ulid.timestampMsComposed($"id").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff === 0)
  }

  test("native decode round-trips a literal timestamp and survives codegen") {
    val tsMs = 1705276800123L
    val df = Seq(1).toDF("x")
      .select(Ulid.deterministic(lit(tsMs), lit("seed")).as("id"))
      .select(Ulid.timestampMs($"id").as("ts"))
    assert(df.collect().head.getLong(0) === tsMs)
    // used inside a filter → exercised in whole-stage codegen
    val n = EventsAsTopic.messagesFromEvents(spark, sf)
      .filter(Ulid.timestampMs($"id") >= 0L).count()
    assert(n > 0)
  }
}
