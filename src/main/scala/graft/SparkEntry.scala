package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's query + oracle registry. Each key in
  * `queries` has a DuckDB-equivalent in `oracleSql` unless the operator is
  * inherently approximate / non-SQL-expressible (rows-only check).
  *
  * Cache contract: some query builders `persist()` a shared intermediate
  * (e.g. the dedup chain's shingle set) because Catalyst has no
  * cross-branch common-subexpression elimination. The CALLER owns the
  * cache scope — run `spark.catalog.clearCache()` after consuming a
  * query's result (Verify and Bench both do, per query), or the cached
  * blocks stay pinned for the session.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private def registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracles),
      (graft.queries.Relational2.queries, graft.queries.Relational2.oracles),
      (graft.queries.Relational3.queries, graft.queries.Relational3.oracles),
      (graft.queries.RecQueries.queries, graft.queries.RecQueries.oracles),
      (graft.queries.EventQueries.queries, graft.queries.EventQueries.oracles),
      (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
      (graft.queries.DedupQueries.queries, graft.queries.DedupQueries.oracles),
      (graft.queries.SamplingQueries.queries, graft.queries.SamplingQueries.oracles),
      (graft.queries.CurationQueries.queries, graft.queries.CurationQueries.oracles),
      (graft.queries.AnnQueries.queries, graft.queries.AnnQueries.oracles),
      (graft.queries.MultimodalQueries.queries, graft.queries.MultimodalQueries.oracles),
      (graft.rawdata.RawdataQueries.queries, graft.rawdata.RawdataQueries.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    registries.iterator.flatMap(_._2).toMap
}
