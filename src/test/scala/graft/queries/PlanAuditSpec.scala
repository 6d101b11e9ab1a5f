package graft.queries

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.{SparkSpec, SparkEntry}

/** Plan-quality gate: the shapes that kill a 100 TB run must not appear
  * in any registered query's physical plan.
  *
  *  - CartesianProduct: never acceptable.
  *  - BroadcastNestedLoopJoin: only where one side is a deliberately tiny
  *    broadcast (the IVF centroid assignment).
  *  - Un-partitioned Window (all rows to one task): only downstream of a
  *    distributed top-k limit that already bounded the input.
  */
class PlanAuditSpec extends SparkSpec {

  // deliberate tiny-side broadcasts: IVF / k-means / outlier assignment
  // pair the corpus against a k-row centroid relation; samp_temperature
  // joins the single-row weight total; txt_bpe's merge step broadcasts
  // the single best-pair row against the vocab relation
  private val nestedLoopAllowed =
    Set("ann_ivf_topk", "emb_kmeans", "emb_outliers", "samp_temperature",
      "txt_bpe", "txt_bpe_encode")
  private val globalWindowAllowed = Set("rd_ordering_group")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plan has no scale-hostile operators") {
      val plan = fn(spark, sf).queryExecution.executedPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"CartesianProduct in $name")
      val nested = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(nested.isEmpty || nestedLoopAllowed(name),
        s"BroadcastNestedLoopJoin in $name:\n${nested.headOption.getOrElse("")}")
      val globalWin = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(globalWin.isEmpty || globalWindowAllowed(name),
        s"un-partitioned Window in $name (single-partition bottleneck)")
    }
  }
}
