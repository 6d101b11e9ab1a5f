package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LeafNode, LocalRelation, LogicalPlan, Range, ResolvedHint}
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
      "txt_bpe", "txt_bpe_encode",
      // single-row bounds/total relation crossed into the corpus
      "samp_systematic",
      // single-row weight-total and ESS relations crossed into the
      // |sources|-row mixture profile
      "samp_ess",
      // ≤ FpsK-row selected set crossed into the corpus each round
      "emb_fps",
      // |labels|-row centroid relation crossed into the corpus (the
      // relation is an Aggregate, so the broadcast rule bounds it; the
      // join itself is the same deliberate tiny-side BNLJ as emb_kmeans)
      "emb_centroid_confusion",
      // the same |labels|-row centroid relation crossed into the corpus
      // for the per-label scoring pass
      "emb_ood_auc",
      // the nprobe sweep composes ann_ivf_topk's centroid-seed BNLJ
      "ann_ivf_recall",
      // the operating-point table composes ann_ivf_recall +
      // ann_probe_cost verbatim — it inherits exactly their exempted
      // constructs, nothing new broadcasts
      "ann_operating_point",
      // the IVF-PQ composition reuses ann_ivf_topk's centroid-seed BNLJ
      // for its coarse assignment
      "ann_ivf_pq",
      // the served-index probe ranks query cells via the same
      // codebook-broadcast BNLJ (codebook = % step seeds, k rows)
      "ann_ivf_index",
      // the 10-row decile relation crossed into the value histogram
      "q50_stats_hist",
      // same 10-row decile cross, per-lang form
      "txt_len_deciles")
  // samp_systematic's second exemption: the shard-offset prefix window
  // runs over the per-shard sums relation, ≤ SysShards (1024) rows by
  // construction whatever the corpus size — not a corpus-sized funnel
  // txt_coverage's third exemption: the band-prefix window runs over the
  // distinct-frequency-counts relation, O(√total-tokens) rows by
  // construction (d distinct positive counts sum to ≥ d(d+1)/2) — never
  // the vocabulary, never the corpus
  // samp_waterfill: its windows run over the |sources|-row token
  // profile — an aggregate of the corpus, bounded by the source
  // vocabulary whatever the corpus size
  // samp_neyman: its apportionment window runs over the |strata|-row
  // profile — bounded whatever the corpus size
  // q50_stats_hist / rd_compact_plan: windows over the |distinct
  // values| histogram and the |files| listing — both aggregates of the
  // data, bounded whatever the corpus size
  // rd_latency: its prefix window runs over the latency-seconds
  // histogram — bounded by the producer window length (< 86 400 rows)
  // whatever the corpus size, the same calendar/length-bounded class as
  // q50_stats_hist's value histogram
  // txt_kl: the corpus-total window runs over the |sources|-row
  // per-source aggregate — bounded whatever the corpus size (the
  // samp_waterfill class)
  // round-12 additions (the AQE unwrap below made the rule see EVERY
  // plan for the first time — these sites were always there, each over
  // a relation PROVABLY bounded whatever the corpus size):
  //  - |sources|-row profiles: samp_share_skew, samp_rebalance
  //  - |event_type| / ≤64-band / calendar aggregates: ev_first_touch,
  //    ev_activity_bands, ev_mix_drift (|days|)
  //  - TPC-H dimension-bounded rollups: q63_running_share (|months|),
  //    q69_order_sizes / q70_cust_lifespan / q80_spend_bands (≤64
  //    log₂ bands), q71_discount_effect (11 discount levels),
  //    q75_brand_share (25 brands), q78_seasonal_index (12 months),
  //    q79_trade_matrix (≤625 nation cells)
  //  - |files| listings: rd_compact_gain, rd_partition_plan
  //  - construction-capped relations: txt_bpe (≤BpeMerges merge rows),
  //    txt_zipf (post-limit(100) rank window), mm_aspect_buckets
  //    (|aspect buckets|), mm_decode_plan (|container formats|)
  private val globalWindowAllowed =
    Set("rd_ordering_group", "samp_systematic", "txt_coverage",
      "samp_waterfill", "samp_neyman", "q50_stats_hist",
      "rd_compact_plan", "rd_expire_plan", "rd_latency", "txt_kl",
      "samp_share_skew", "samp_rebalance",
      "ev_first_touch", "ev_activity_bands", "ev_mix_drift",
      "q63_running_share", "q69_order_sizes", "q70_cust_lifespan",
      "q71_discount_effect", "q75_brand_share", "q78_seasonal_index",
      "q79_trade_matrix", "q80_spend_bands",
      "rd_compact_gain", "rd_partition_plan",
      "txt_bpe", "txt_zipf", "mm_aspect_buckets", "mm_decode_plan",
      // ordered prefix windows over value HISTOGRAMS of the data — d
      // distinct positive counts sum to ≥ d(d+1)/2, so the relation is
      // O(√total) rows whatever the corpus size (the txt_coverage
      // argument): ev_gini / ev_lorenz run on the per-user activity
      // histogram, ev_survival on the |distinct survival days| ≤
      // calendar K-M spine, rd_retention_curve on the horizon-step
      // spine of the |files| listing
      "ev_gini", "ev_lorenz", "ev_survival", "rd_retention_curve",
      // |sources|-row mixture profile (the samp_waterfill class)
      "pipe_train_mix",
      // post-limit(k+1) rank window — GlobalLimit bounds it outright
      // (the txt_zipf class)
      "samp_priority",
      // ≤BpeMerges+|byte alphabet| artifact rows by construction
      "txt_bpe_vocab",
      // the 10-row decile slice spine
      "txt_heaps")

  /** every physical node, INCLUDING inside AQE: executedPlan is an
    * opaque AdaptiveSparkPlanExec LEAF whenever the query has an
    * exchange (i.e. for nearly every registered query), so a naive
    * plan.collect sees nothing — the audit must recurse through
    * initialPlan and through subquery expression plans or it is
    * vacuous exactly where it matters
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val expanded = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.initialPlan)
      case s: org.apache.spark.sql.execution.SubqueryExec => allNodes(s.child)
      case b: org.apache.spark.sql.execution.SubqueryBroadcastExec => allNodes(b.child)
      case other =>
        other.expressions.flatMap(_.collect {
          case pl: org.apache.spark.sql.execution.ScalarSubquery => allNodes(pl.plan)
        }).flatten :+ other
    }
    expanded.flatten
  }

  /** physical mirror of the logical bounded(): a subtree whose row count
    * cannot grow unboundedly with the fact tables — an aggregation
    * bounds it to its group count (the same judgment the logical rule
    * makes for broadcast hints), a limit/TakeOrdered to a constant, a
    * local relation to its literal rows. A BroadcastNestedLoopJoin whose
    * BUILD side satisfies this is the deliberate tiny-side pattern
    * (1-row totals, |sources| profiles crossed into the corpus), not a
    * scale hazard.
    */
  private def boundedPhys(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _: org.apache.spark.sql.execution.RangeExec => true // mirror of logical Range
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => boundedPhys(r.child)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => boundedPhys(a.initialPlan)
    case l if l.children.isEmpty => false
    case other => other.children.forall(boundedPhys)
  }

  private def buildSideOf(j: BroadcastNestedLoopJoinExec): org.apache.spark.sql.execution.SparkPlan =
    j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
    }

  // deliberate constant-bounded broadcasts the structural rule can't
  // see: ann_* broadcast the fixed 25-row query slice (vec_id <
  // NumQueries) and ann_pq_topk its derived shortlist; ann_ivf_topk /
  // emb_kmeans / emb_outliers broadcast the k-row centroid seed slice
  // (vec_id < K / % step) — all constant id bounds, sf-independent by
  // construction
  private val constantSliceBroadcastAllowed =
    Set("ann_brute_topk", "ann_lsh_topk", "ann_pq_topk",
      // recall eval composes the same two fixed-query-slice broadcasts
      "ann_recall_eval",
      "ann_ivf_topk", "emb_kmeans", "emb_outliers",
      // emb_silhouette: the same k-row centroid seed slice (vec_id < K)
      // as emb_kmeans/emb_outliers — constant bound, sf-independent
      "emb_silhouette",
      // the same fixed 5-row query slice, carrying token set + vector
      "ann_hybrid",
      // emb_fps: the selected set is ≤ FpsK rows by construction (seed
      // slice + one limit(1) pick per round)
      "emb_fps",
      // txt_bpe_encode: the broadcast is each round's checkpointed
      // best-pair relation — exactly one row by limit(1) construction
      // (the checkpoint hides the GlobalLimit from the structural rule)
      "txt_bpe_encode",
      // dd_bloom: the broadcast is the DISTINCT bit-position relation,
      // ≤ m = 65536 rows whatever the corpus size (positions live mod m)
      "dd_bloom",
      // ann_range / emb_mmr: the same fixed 5-row query slice as
      // ann_brute_topk; emb_mmr additionally re-broadcasts its
      // window-bounded ≤ 20·|queries|-row candidate pool rounds
      "ann_range", "emb_mmr",
      // the nprobe sweep broadcasts ann_ivf_topk's two constant slices
      // (fixed 5-row query set, % step centroid seeds)
      "ann_ivf_recall",
      // composes ann_ivf_recall + ann_probe_cost verbatim (see above)
      "ann_operating_point",
      // the 16-row codebook slice, same constant bound as ann_pq_topk
      "emb_pq_distortion",
      // the same 16-row codebook slice, feeding the usage-balance agg
      "emb_pq_code_balance",
      // IVF-PQ composition: fixed query slice, % step centroid seeds,
      // 16-row codebook, 640-row LUT, and the shortlist (window-bounded
      // ≤ 25·|queries| rows) — every broadcast constant-bounded
      "ann_ivf_pq",
      // served-index probe: fixed query slice + its ≤|queries|·nprobe
      // probe relation
      "ann_ivf_index",
      // cell-tightness audit: the broadcast is the frozen √n-sized
      // codebook — the ann_ivf_index serving precedent (sub-linear by
      // the sqrt nlist scale rule, exactly what IVF serving broadcasts)
      "emb_cell_radius",
      // probe-cost sweep: the √n codebook + the |cells|-row size
      // relation + the 1-row corpus total — all sub-linear broadcasts
      "ann_probe_cost",
      // the 10-row decile relation crossed into the value histogram
      "q50_stats_hist",
      // same 10-row decile cross, per-lang form
      "txt_len_deciles")

  /** a hinted subtree is scale-safe iff its row count cannot grow with
    * the fact tables: an aggregation / limit / literal relation bounds
    * it outright; otherwise every child must be bounded and every leaf a
    * dimension-table scan (region/nation — fixed cardinality in TPC-H)
    */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalRelation | _: Range => true
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.forall { rp =>
            val s = rp.toString
            s.contains("region") || s.contains("nation")
          }
        case _ => false
      }
    case _: LeafNode => false
    case other => other.children.forall(bounded)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name has no forced broadcast of an sf-scaling relation") {
      val analyzed = fn(spark, sf).queryExecution.analyzed
      val unsafe = analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.isDefined && !bounded(h.child) => h
      }
      assert(unsafe.isEmpty || constantSliceBroadcastAllowed(name),
        s"forced broadcast of an sf-scaling relation in $name:\n${unsafe.headOption.getOrElse("")}")
    }

    test(s"$name plan has no scale-hostile operators") {
      val nodes = allNodes(fn(spark, sf).queryExecution.executedPlan)
      val cartesian = nodes.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"CartesianProduct in $name")
      // a BNLJ is fine when its build side is structurally bounded (the
      // 1-row-total / grouped-profile crossJoin pattern); only builds
      // the structural rule can't see (constant-id filtered scans) need
      // the documented name exemptions
      val nested = nodes.collect {
        case j: BroadcastNestedLoopJoinExec if !boundedPhys(buildSideOf(j)) => j
      }
      assert(nested.isEmpty || nestedLoopAllowed(name) || constantSliceBroadcastAllowed(name),
        s"BroadcastNestedLoopJoin with unbounded build in $name:\n${nested.headOption.getOrElse("")}")
      // NOTE a constant partition spec (partitionBy(lit(1))) is the same
      // single-task funnel: Spark 4's EliminateWindowPartitions folds it
      // to an EMPTY spec, so this one predicate covers both spellings —
      // and the foldable guard below keeps covering them if that
      // optimizer rule is ever disabled
      val globalWin = nodes.collect {
        case w: WindowExec
          if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
      }
      assert(globalWin.isEmpty || globalWindowAllowed(name),
        s"un-partitioned Window in $name (single-partition bottleneck)")
    }
  }
}
