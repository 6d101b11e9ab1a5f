package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Structural invariants for dd_cluster (connected components) and the
  * sampling operators — properties the oracle's value-compare can't
  * state directly (transitivity, budgets, determinism).
  */
class ClusterSamplingSpec extends SparkSpec {

  test("dd_cluster: components contain every near-dup pair and are min-labeled") {
    val spark2 = spark
    import spark2.implicits._
    val clusters = SparkEntry.queries("dd_cluster")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (doc, cid, n) => doc -> (cid, n) }.toMap
    spark.catalog.clearCache()
    assert(clusters.nonEmpty, "the sf0.001 corpus has known duplicates")

    // cluster id is the min member, size matches the member count
    val members = clusters.toSeq.groupBy(_._2._1).map { case (cid, ms) => cid -> ms.map(_._1) }
    for ((cid, docs) <- members) {
      assert(docs.min == cid, s"cluster $cid is not labeled by its min member")
      assert(docs.forall(d => clusters(d)._2 == docs.size.toLong))
      assert(docs.size >= 2, "singleton docs must not appear in the cluster output")
    }

    // transitive closure: both endpoints of every verified near-dup pair
    // share a cluster (the property pair output alone does not give you)
    val pairs = SparkEntry.queries("dd_jaccard")(spark, sf)
      .filter($"jaccard_ppm" >= 400000)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    for ((a, b) <- pairs)
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
  }

  test("samp_stratified: deterministic, within stratum bounds, small strata kept whole") {
    val spark2 = spark
    import spark2.implicits._
    val run1 = SparkEntry.queries("samp_stratified")(spark, sf).as[(String, Long)].collect()
    val run2 = SparkEntry.queries("samp_stratified")(spark, sf).as[(String, Long)].collect()
    assert(run1.sameElements(run2), "hash sampling must be run-to-run deterministic")
    val kept = run1.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val totals = graft.Tables.t(spark, sf, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- totals) {
      assert(kept.getOrElse(lang, 0L) <= n)
      // threshold = target*2^32 div n ≥ 2^32 when n ≤ target → keep all
      if (n <= 40L) assert(kept.getOrElse(lang, 0L) == n, s"small stratum $lang must be kept whole")
    }
  }

  test("samp_token_budget: every source stream selected, budget respected") {
    val spark2 = spark
    import spark2.implicits._
    val sel = SparkEntry.queries("samp_token_budget")(spark, sf)
      .as[(String, Long, Long)].collect()
    val sources = graft.Tables.t(spark, sf, "documents")
      .select($"source").distinct().as[String].collect().toSet
    assert(sel.map(_._1).toSet == sources, "no stream may starve (first doc always taken)")
    for ((src, docs) <- sel.groupBy(_._1)) {
      val toks = docs.map(_._3)
      // all but the last-admitted doc fit strictly under the budget
      assert(toks.sum - toks.max < 4000L, s"source $src blew its token budget")
    }
  }
}
