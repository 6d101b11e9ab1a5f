package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables.
  *
  * Scale note: plain `spark.read.parquet` keeps scans declarative so
  * Catalyst pushes filters/projections into the parquet reader — at
  * 100 TB the win is column pruning + row-group predicate skipping, so
  * queries must never materialize a table before filtering it.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` restored to TimestampType (µs, truncated from the
    * parquet ns value — matches DuckDB's ns→µs cast truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    if (raw.schema("ts").dataType.typeName == "long")
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
