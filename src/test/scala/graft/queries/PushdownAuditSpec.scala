package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.{SparkEntry, SparkSpec}

/** Scan-efficiency gate: filters must reach the parquet scan and the
  * scan must read only the columns the query projects — at 100 TB the
  * difference between reading 2 columns and 16 is the job.
  */
class PushdownAuditSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    // see the cache-hygiene note on the strict-subset loop: never audit
    // a plan that another suite's live cache could rewrite
    spark.catalog.clearCache()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  private def pushedFilters(s: FileSourceScanExec): String =
    s.metadata.getOrElse("PushedFilters", "[]")

  test("q2_filter_project: predicate pushed to the scan, strict column subset read") {
    val sc = scans(SparkEntry.queries("q2_filter_project")(spark, sf))
    assert(sc.nonEmpty, "expected a parquet scan")
    sc.foreach { s =>
      assert(s.requiredSchema.size < s.relation.dataSchema.size,
        s"scan reads all ${s.relation.dataSchema.size} columns — projection not pruned")
    }
    assert(sc.exists(pushedFilters(_) != "[]"), "no filter reached any scan")
  }

  test("q6_scan_agg: selective predicates pushed down, only agg inputs read") {
    val sc = scans(SparkEntry.queries("q6_scan_agg")(spark, sf))
    assert(sc.nonEmpty)
    assert(sc.exists(pushedFilters(_) != "[]"), "no filter reached any scan")
    sc.foreach { s =>
      assert(s.requiredSchema.size < s.relation.dataSchema.size)
    }
  }

  test("q1_agg: lineitem scan prunes to the aggregation's input columns") {
    val sc = scans(SparkEntry.queries("q1_agg")(spark, sf))
    assert(sc.nonEmpty)
    sc.foreach { s =>
      assert(s.requiredSchema.size < s.relation.dataSchema.size,
        s"read ${s.requiredSchema.fieldNames.mkString(",")} of ${s.relation.dataSchema.size} columns")
    }
  }

  test("txt_tokens: documents scan reads only (doc_id, source, text)-sized slice") {
    val sc = scans(SparkEntry.queries("txt_tokens")(spark, sf))
    assert(sc.nonEmpty)
    sc.foreach { s =>
      assert(s.requiredSchema.size < s.relation.dataSchema.size,
        s"read ${s.requiredSchema.fieldNames.mkString(",")} — expected a strict subset of documents' columns")
    }
  }

  // round-5 additions: every new scan-rooted operator still prunes its
  // table to a strict column subset (none of them needs every column).
  // txt_pmi is absent only because its scan sits inside a persisted
  // InMemoryRelation — it shares txt_skipgrams' gated scan.
  for (name <- Seq("txt_skipgrams", "txt_hapax", "samp_curriculum",
      "dd_prefix", "emb_gram", "emb_dim_stats", "emb_centroid_cos",
      "ev_attribution", "ev_markov", "ev_trend", "q32_grouping_sets")) {
    test(s"$name: scans read a strict column subset") {
      // cache hygiene: another suite's persisted relation would be
      // substituted into this plan by the cache manager, hiding the
      // file scan under an InMemoryRelation (the harness clearCaches
      // between queries for the same reason)
      spark.catalog.clearCache()
      val sc = scans(SparkEntry.queries(name)(spark, sf))
      assert(sc.nonEmpty, "expected a parquet scan")
      sc.foreach { s =>
        assert(s.requiredSchema.size < s.relation.dataSchema.size,
          s"$name read ${s.requiredSchema.fieldNames.mkString(",")} of " +
            s"${s.relation.dataSchema.size} columns")
      }
    }
  }
}
