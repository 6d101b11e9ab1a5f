package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the materialized IVF index: the served probe is row-identical
  * to the inline ann_ivf_topk computation, the posting-list scan is
  * partition-pruned to the probed cells, and append assigns to the
  * FROZEN codebook (content equal to re-assigning the union corpus to
  * the base centroids).
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("served probe is row-identical to ann_ivf_topk") {
    val idx = graft.SparkEntry.queries("ann_ivf_index")(spark, sf).collect().toSeq
    val inline = graft.SparkEntry.queries("ann_ivf_topk")(spark, sf).collect().toSeq
    assert(idx === inline)
    assert(idx.nonEmpty)
  }

  test("the cells scan carries partition filters (pruned to probed cells)") {
    val pruned = EmbIvfIndex.cells(spark, sf).filter($"cent_id".isin(0L, 100L))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "cent_id filter did not reach the partition pruning layer")
    // pruning is real: the filtered scan's row count is a strict subset
    val total = EmbIvfIndex.cells(spark, sf).count()
    assert(pruned.count() < total)
  }

  /** the index's own assignment rule, reproduced independently */
  private def assignTo(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy($"vec_id").orderBy($"c_ppm".desc, $"cent_id")
    e.join(broadcast(cents), lit(true))
      .withColumn("dot", expr(
        "aggregate(zip_with(q, qc, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("c_ppm",
        floor($"dot" / (sqrt($"nn") * sqrt($"nc")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("crnk", row_number().over(w))
      .filter($"crnk" === 1)
      .select($"cent_id", $"vec_id", $"q", $"nn")
  }

  test("append assigns new vectors to the frozen codebook") {
    val base = graft.rawdata.Topic.tempDir("ivf-append")
    val all = graft.Tables.t(spark, sf, "embeddings")
    // split at 3/4 of the id space so the append batch is non-empty at
    // any sf (sf0.001 carries 500 vectors, not 2000)
    val Split = all.agg(max($"vec_id")).head().getLong(0) * 3 / 4
    all.filter($"vec_id" < Split).write.mode("overwrite")
      .parquet(s"$base/embeddings.parquet")
    EmbIvfIndex.ensure(spark, base)
    val frozen = EmbIvfIndex.cents(spark, base)
    // seeds all come from the base half (codebook frozen at build)
    assert(frozen.agg(max($"cent_id")).head().getLong(0) < Split)

    val newVecs = graft.operators.VectorOps.quantized(spark, sf)
      .filter($"vec_id" >= Split)
    EmbIvfIndex.append(spark, base, newVecs)

    val got = EmbIvfIndex.cells(spark, base)
      .select($"cent_id", $"vec_id").as[(Long, Long)].collect().toSet
    val want = assignTo(graft.operators.VectorOps.quantized(spark, sf), frozen)
      .select($"cent_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got.exists(_._2 >= Split), "appended vectors missing from cells")
  }
}
