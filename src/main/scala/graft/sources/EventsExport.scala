package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optional date-partitioned layout for the events fact table (SURVEY
  * §2.H): events written as parquet PARTITIONED BY event_date
  * (UTC day of `ts`).
  *
  * Why this layout at 100 TB: every ev_* operator's most common
  * predicate is a time window, and on a flat parquet layout that filter
  * only reaches row-group statistics — the scan still LISTS and opens a
  * slice of every file. Directory-partitioning by day turns the same
  * window into PLAN-TIME partition pruning (selectedPartitions shrinks
  * to the window's days — EventsPartitionSpec proves it, mirroring
  * CorpusExportSpec), so a one-week query over a three-year topic
  * touches ~0.6 % of the files no matter the corpus size.
  *
  * The partition column is DERIVED (event_date = to_date(ts)), and
  * Spark does not infer date-partition pruning from a raw `ts`
  * predicate — [[read]] therefore takes the time window explicitly and
  * applies BOTH the day-level partition filter (pruning) and the exact
  * ts bounds (row filtering), which is the contract a production reader
  * wants anyway. The written directory stays a drop-in `events.parquet`
  * replacement: readers that ignore the layout (all registered ev_*
  * queries via Tables.events) see the same rows plus one extra
  * event_date column.
  */
object EventsExport {

  /** Write `events` (the normalized Tables.events shape) under `dir`
    * date-partitioned; one task owns one day via the pre-write
    * repartition (no small-file spray). Returns rows written.
    */
  def write(events: DataFrame, dir: String): Long = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("event_date", to_date($"ts"))
      .repartition($"event_date")
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)
    s.read.parquet(dir).count()
  }

  /** Read back, pruned to [fromTsMs, toTsMs): the day-range predicate
    * reaches the partition layer at plan time, the exact ts bounds
    * filter rows within the boundary days.
    */
  def read(s: SparkSession, dir: String, fromTsMs: Long, toTsMs: Long): DataFrame = {
    import s.implicits._
    s.read.parquet(dir)
      .filter($"event_date" >= to_date(timestamp_millis(lit(fromTsMs))) &&
        $"event_date" <= to_date(timestamp_millis(lit(toTsMs))))
      .filter($"ts" >= timestamp_millis(lit(fromTsMs)) &&
        $"ts" < timestamp_millis(lit(toTsMs)))
  }

  /** Unpruned read (drop-in events relation, event_date retained). */
  def read(s: SparkSession, dir: String): DataFrame = s.read.parquet(dir)
}
