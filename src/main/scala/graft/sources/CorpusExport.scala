package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-side layout for a prepared training corpus (SURVEY §2.H): the
  * cleaned/packed documents written as parquet PARTITIONED BY source
  * with a deterministic hash shard inside each partition.
  *
  * Why this layout at 100 TB:
  *  - `source=` directory partitioning lets every downstream mixture
  *    job prune whole sources at PLAN time (the samp_* operators' most
  *    common predicate);
  *  - the `shard` column (md5 of doc_id mod nShards — the same
  *    deterministic recipe as samp_shuffle) gives consumers a stable,
  *    engine-independent parallel unit and a reproducible training
  *    order key, decoupled from whatever partitioning the cleaning job
  *    happened to end with;
  *  - `repartition(source, shard)` before the write makes one task own
  *    one output file per (source, shard) — no small-file spray from a
  *    wide upstream shuffle, no single-writer bottleneck.
  */
object CorpusExport {

  /** Writes `docs` (any relation with source + doc_id columns) under
    * `dir` partitioned by source, sharded `nShards` ways. Returns the
    * number of rows written.
    */
  def write(docs: DataFrame, dir: String, nShards: Int = 8): Long = {
    val s = docs.sparkSession
    import s.implicits._
    val sharded = docs.withColumn("shard",
      pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long"),
        lit(nShards.toLong)))
    sharded
      .repartition($"source", $"shard")
      .write.mode("overwrite")
      .partitionBy("source")
      .parquet(dir)
    s.read.parquet(dir).count()
  }

  /** Reads an exported corpus back; `sources` prunes partitions at plan
    * time when given.
    */
  def read(s: SparkSession, dir: String, sources: Seq[String] = Nil): DataFrame = {
    val df = s.read.parquet(dir)
    if (sources.isEmpty) df else df.filter(col("source").isin(sources: _*))
  }
}
