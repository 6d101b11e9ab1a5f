package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the cluster-size / lifetime histogram pair: both are exact
  * count-of-counts over relations other registered operators already
  * prove (dd_cluster's components, the per-user event stream), so the
  * specs assert conservation against those relations plus a forced
  * template-leak corpus where the histogram's exact rows are known.
  */
class LifecycleClusterHistSpec extends SparkSpec {
  import spark.implicits._

  // ---- dd_cluster_hist ----------------------------------------------------

  test("dd_cluster_hist: conserves dd_cluster's clusters, docs and removal mass") {
    val hist = DedupQueries.queries("dd_cluster_hist")(spark, sf).collect()
    spark.catalog.clearCache()
    val comp = DedupQueries.queries("dd_cluster")(spark, sf).collect()
    spark.catalog.clearCache()
    val bySize = comp.map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members")))
      .distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(hist.map(r => r.getAs[Long]("size") -> r.getAs[Long]("n_clusters")).toMap
      === bySize)
    assert(hist.map(_.getAs[Long]("n_docs")).sum === comp.length.toLong)
    hist.foreach { r =>
      assert(r.getAs[Long]("size") >= 2L) // components are never singletons
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("n_removed") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
  }

  test("dd_cluster_hist: a forced template leak shows up as one big-cluster row") {
    val dir = graft.rawdata.Topic.tempDir("clusterhist-template")
    // 5 identical "template" docs (one 5-cluster) + 2 exact twins (one
    // 2-cluster) + 2 unrelated singletons (absent from the histogram)
    val rows =
      Seq.tabulate(5)(i =>
        (i.toLong, "the weekly status template header body footer line", "en", "web")) ++
      Seq((10L, "zebra quagga okapi tapir unique pair text", "en", "web"),
        (11L, "zebra quagga okapi tapir unique pair text", "en", "web"),
        (20L, "completely different first singleton document body", "en", "web"),
        (21L, "another unrelated second singleton document text", "en", "web"))
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hist = DedupQueries.queries("dd_cluster_hist")(spark, dir).collect()
      .map(r => r.getAs[Long]("size") ->
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_removed"))).toMap
    spark.catalog.clearCache()
    assert(hist === Map(2L -> (1L, 1L), 5L -> (1L, 4L)))
  }

  // ---- ev_lifecycle ---------------------------------------------------------

  test("ev_lifecycle: spans conserve users and re-derive from per-user min/max timestamps") {
    val rows = EventQueries.queries("ev_lifecycle")(spark, sf).collect()
    val direct = graft.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 86400000000").as("sd"))
      .collect().map(_.getLong(1))
    assert(rows.map(_.getAs[Long]("n_users")).sum === direct.length.toLong)
    val expected = direct.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getAs[Long]("span_days") -> r.getAs[Long]("n_users")).toMap
      === expected)
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }
}
