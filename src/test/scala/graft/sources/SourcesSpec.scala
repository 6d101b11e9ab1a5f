package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.rawdata.Topic

/** SURVEY §2.H — source/sink round-trips: parquet (everywhere), Avro
  * (topic format), CSV and JSON with schema preservation.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = Topic.tempDir(s"sources-$name")

  test("csv round-trip preserves rows and values (header + explicit schema)") {
    val out = tmp("csv")
    val orig = Tables.t(spark, sf, "part")
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(orig.schema).csv(out)
    assert(back.count() === orig.count())
    val a = orig.agg(sum($"p_retailprice").cast("decimal(18,2)")).collect().head.get(0)
    val b = back.agg(sum($"p_retailprice").cast("decimal(18,2)")).collect().head.get(0)
    assert(a === b)
  }

  test("json round-trip preserves rows and values") {
    val out = tmp("json")
    val orig = Tables.t(spark, sf, "customer")
    orig.write.mode("overwrite").json(out)
    val back = spark.read.schema(orig.schema).json(out)
    assert(back.count() === orig.count())
    assert(back.agg(sum($"c_acctbal").cast("decimal(18,2)")).collect().head ===
      orig.agg(sum($"c_acctbal").cast("decimal(18,2)")).collect().head)
  }

  test("avro topic write/read round-trips the rawdata message schema") {
    val out = tmp("avro")
    val msgs = graft.rawdata.EventsAsTopic.messagesFromEvents(spark, sf)
    Topic.write(msgs, out, graft.rawdata.EventsAsTopic.cfg)
    val back = Topic.read(spark, out).toDF()
    assert(back.count() === msgs.count())
    assert(back.schema.fieldNames.toSet ===
      Set("id", "orderingGroup", "sequenceNumber", "position", "data"))
    // payload bytes survive the round-trip
    val payloadSum = expr("aggregate(map_values(data), 0L, (a, v) -> a + length(v))")
    val origSum = msgs.select(sum(payloadSum)).collect().head.getLong(0)
    val backSum = back.select(sum(payloadSum)).collect().head.getLong(0)
    assert(origSum === backSum)
  }

  test("parquet writes are re-readable with pushdown intact") {
    val out = tmp("parquet")
    Tables.t(spark, sf, "orders").write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).filter($"o_totalprice" > 100000.0)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"))
    assert(back.count() ===
      Tables.t(spark, sf, "orders").filter($"o_totalprice" > 100000.0).count())
  }
}
