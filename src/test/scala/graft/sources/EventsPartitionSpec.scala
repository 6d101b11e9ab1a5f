package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The date-partitioned events layout: lossless round-trip, PLAN-TIME
  * partition pruning for a time window (CorpusExportSpec's assertion on
  * the fact table), and drop-in compatibility — a registered ev_* query
  * returns identical rows against the partitioned layout.
  */
class EventsPartitionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val flat = graft.Tables.events(spark, sf)

  private lazy val dir: String = {
    val d = graft.rawdata.Topic.tempDir("events-part")
    val n = EventsExport.write(flat, s"$d/events.parquet")
    assert(n === flat.count())
    d
  }

  test("a time window prunes partitions at plan time and keeps exact rows") {
    val Seq(minMs, maxMs) = flat
      .agg(unix_millis(min($"ts")), unix_millis(max($"ts")))
      .as[(Long, Long)].head() match { case (a, b) => Seq(a, b) }
    // a ~3-day window in the middle of the month-long stream
    val from = minMs + (maxMs - minMs) / 2
    val to = from + 3L * 24 * 3600 * 1000
    val pruned = EventsExport.read(spark, s"$dir/events.parquet", from, to)

    val plan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.nonEmpty, "day filter never reached the partition layer")
    val allDays = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_date").distinct().count()
    assert(scan.selectedPartitions.partitionCount.toLong < allDays,
      s"expected pruning: scan reads ${scan.selectedPartitions.partitionCount} of $allDays day partitions")
    assert(scan.selectedPartitions.partitionCount.toLong <= 4L,
      "a 3-day window must touch at most 4 day partitions")

    // exactness: same rows as the flat relation filtered on ts
    val want = flat
      .filter($"ts" >= timestamp_millis(lit(from)) && $"ts" < timestamp_millis(lit(to)))
      .select($"event_id").as[Long].collect().toSet
    val got = pruned.select($"event_id").as[Long].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("registered ev_* queries run unchanged against the partitioned layout") {
    val got = graft.queries.EventQueries.queries("ev_tumbling")(spark, dir).collect().toSeq
    val want = graft.queries.EventQueries.queries("ev_tumbling")(spark, sf).collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
