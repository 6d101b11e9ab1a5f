package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The exported corpus must round-trip losslessly, lay out one file per
  * (source, shard), and prune partitions at plan time for a source
  * predicate.
  */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  test("export round-trips, shards deterministically, and prunes source partitions") {
    val dir = graft.rawdata.Topic.tempDir("corpus-export")
    val docs = Tables.t(spark, sf, "documents")
      .select($"doc_id", $"source", $"lang", $"text")
    val n = CorpusExport.write(docs, dir, nShards = 4)
    assert(n === docs.count())

    // lossless round-trip (source survives the partition column round-trip)
    val back = CorpusExport.read(spark, dir)
    assert(back.select($"doc_id", $"source", $"lang", $"text").collect().toSet
      === docs.collect().toSet)

    // shard values are the samp_shuffle recipe: deterministic, in range
    val shards = back.select($"shard").distinct().as[Long].collect().toSet
    assert(shards.subsetOf((0L until 4L).toSet))
    val recomputed = back.filter(
      $"shard" =!= pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long"), lit(4L)))
    assert(recomputed.count() === 0L)

    // a source predicate prunes partitions at PLAN time: the scan's
    // selected partitions shrink, not just its post-filter output
    val one = docs.select($"source").distinct().as[String].head()
    val pruned = CorpusExport.read(spark, dir, Seq(one))
    val plan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    val allSources = docs.select($"source").distinct().count()
    assert(scan.selectedPartitions.partitionCount.toLong < allSources,
      s"expected partition pruning, scan still reads ${scan.selectedPartitions.partitionCount} partitions")
    assert(pruned.select($"source").distinct().as[String].collect().toSeq === Seq(one))
  }
}
