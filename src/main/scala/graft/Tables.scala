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

  /** `events` with `ts` normalized to TimestampType regardless of how the
    * driver generated the parquet column across rounds:
    *   - TIMESTAMP(NANOS) → Spark reads a raw long (SPARK-40819 +
    *     nanosAsLong conf); truncate ns→µs like DuckDB's cast does.
    *   - naive timestamp[us] → Spark 4 infers TIMESTAMP_NTZ; cast to
    *     TimestampType, which under the session's pinned UTC timezone
    *     (GraftSession) denotes the same instant DuckDB's `epoch_us`
    *     reads off the naive value.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
