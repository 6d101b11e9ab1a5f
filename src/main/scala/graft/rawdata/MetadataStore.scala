package graft.rawdata

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-topic key→bytes metadata store (reference:
  * FilesystemRawdataMetadataClient.java / GCSRawdataMetadataClient.java).
  *
  * Spark-native re-expression: instead of one object per key, the store is
  * a (key, value) DataFrame persisted as parquet under
  * `<topicDir>/metadata/` — `put` is an upsert (last write wins per key),
  * `keys`/`get` are pruned scans. Metadata is tiny relative to the topic,
  * so a single parquet dataset is the right granularity at any scale.
  *
  * All filesystem access goes through the Hadoop `FileSystem` API, so the
  * store follows the topic onto any backend (`file://`, `gs://`,
  * `s3a://`) — one code path where the reference ships two clients.
  */
object MetadataStore {

  private def storeDir(topicDir: String): String =
    topicDir.stripSuffix("/") + "/metadata"

  def readAll(spark: SparkSession, topicDir: String): DataFrame = {
    val dir = storeDir(topicDir)
    val conf = HadoopIO.conf()
    if (!HadoopIO.fs(dir, conf).exists(new Path(dir)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
    else spark.read.parquet(dir)
  }

  /** Upsert entries; `updates` must have columns (key string, value binary). */
  def put(spark: SparkSession, topicDir: String, updates: DataFrame): Unit = {
    val existing = readAll(spark, topicDir)
    val merged = updates.select(col("key"), col("value"))
      .unionByName(existing.join(updates.select(col("key")), Seq("key"), "left_anti"))
    val dir = storeDir(topicDir)
    val conf = HadoopIO.conf()
    val fs = HadoopIO.fs(dir, conf)
    val tmp = new Path(dir + ".staging")
    fs.delete(tmp, true)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // Swap staging → live. Single-writer assumption (like the reference's
    // metadata clients): concurrent puts are not coordinated. A reader
    // never sees a half-written parquet file (the staging write completes
    // before the swap), but the swap itself is two renames, so a reader
    // racing the window between rename(dest→old) and rename(staging→dest)
    // can transiently observe an empty store — and on object stores,
    // where "rename" is per-object copy+delete, a partially-copied one.
    // Acceptable under the single-writer model; a store needing stronger
    // read-during-put guarantees should swap via an atomically-updated
    // generation pointer instead.
    val dest = new Path(dir)
    val old = new Path(dir + ".old")
    fs.delete(old, true)
    if (fs.exists(dest)) {
      if (!fs.rename(dest, old)) throw new IllegalStateException(s"rename $dest -> $old failed")
    }
    if (!fs.rename(tmp, dest)) throw new IllegalStateException(s"rename $tmp -> $dest failed")
    fs.delete(old, true): Unit
  }

  def keys(spark: SparkSession, topicDir: String): Seq[String] =
    readAll(spark, topicDir).select("key").collect().map(_.getString(0)).toSeq.sorted

  def get(spark: SparkSession, topicDir: String, key: String): Option[Array[Byte]] =
    readAll(spark, topicDir).filter(col("key") === key)
      .collect().headOption.map(_.getAs[Array[Byte]]("value"))
}
