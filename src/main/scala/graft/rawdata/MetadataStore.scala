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
  * Visibility: the store is log-structured. Each `put` writes a fresh
  * `gen-<ts>-<uuid>` generation directory and readers pick the newest
  * COMMITTED generation (one with Spark's `_SUCCESS` marker). Nothing is
  * ever renamed or overwritten in place, so a reader never observes an
  * empty or half-written store — on a real filesystem or an object store
  * (where directory rename is per-object copy and not atomic, which is
  * why a staging-dir swap can't give this guarantee). Older generations
  * are pruned on the next put, keeping the latest two so an in-flight
  * reader of the previous generation is never pulled out from under.
  * Concurrent puts are last-writer-wins, matching the reference's
  * single-writer metadata model.
  *
  * All filesystem access goes through the Hadoop `FileSystem` API, so the
  * store follows the topic onto any backend (`file://`, `gs://`,
  * `s3a://`) — one code path where the reference ships two clients.
  */
object MetadataStore {

  private def storeDir(topicDir: String): String =
    topicDir.stripSuffix("/") + "/metadata"

  /** newest committed generation path, if any */
  private def currentGen(dir: String): Option[String] = {
    val conf = HadoopIO.conf()
    val fs = HadoopIO.fs(dir, conf)
    val p = new Path(dir)
    if (!fs.exists(p)) None
    else {
      val gens = fs.listStatus(p).iterator
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
        .map(_.getPath)
        .filter(g => fs.exists(new Path(g, "_SUCCESS")))
        .map(_.toString)
        .toSeq
      // gen-<zero-padded ts>-<uuid>: lexicographic max = newest
      if (gens.isEmpty) None else Some(gens.max)
    }
  }

  def readAll(spark: SparkSession, topicDir: String): DataFrame =
    currentGen(storeDir(topicDir)) match {
      case Some(gen) => spark.read.parquet(gen)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
    }

  /** Upsert entries; `updates` must have columns (key string, value binary). */
  def put(spark: SparkSession, topicDir: String, updates: DataFrame): Unit = {
    val existing = readAll(spark, topicDir)
    val merged = updates.select(col("key"), col("value"))
      .unionByName(existing.join(updates.select(col("key")), Seq("key"), "left_anti"))
    writeGeneration(topicDir, merged)
  }

  /** Remove entries by key (reference RawdataMetadataClient.remove) —
    * a fresh generation without them; same visibility guarantees as put.
    */
  def remove(spark: SparkSession, topicDir: String, keys: Seq[String]): Unit = {
    import spark.implicits._
    val remaining = readAll(spark, topicDir)
      .join(keys.toDF("key"), Seq("key"), "left_anti")
    writeGeneration(topicDir, remaining)
  }

  private def writeGeneration(topicDir: String, entries: DataFrame): Unit = {
    val dir = storeDir(topicDir)
    val gen = f"gen-${System.currentTimeMillis()}%020d-${java.util.UUID.randomUUID().toString.take(8)}"
    // the parquet committer writes _SUCCESS last — the generation becomes
    // visible to currentGen only once fully committed
    entries.coalesce(1).write.parquet(dir + "/" + gen)
    pruneOldGenerations(dir, keep = 2)
  }

  /** drop all but the newest `keep` committed generations (plus any
    * uncommitted debris older than the survivors)
    */
  private def pruneOldGenerations(dir: String, keep: Int): Unit = {
    val conf = HadoopIO.conf()
    val fs = HadoopIO.fs(dir, conf)
    val gens = fs.listStatus(new Path(dir)).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .map(_.getPath).toSeq.sortBy(_.getName)
    gens.dropRight(keep).foreach(g => fs.delete(g, true))
  }

  def keys(spark: SparkSession, topicDir: String): Seq[String] =
    readAll(spark, topicDir).select("key").collect().map(_.getString(0)).toSeq.sorted

  def get(spark: SparkSession, topicDir: String, key: String): Option[Array[Byte]] =
    readAll(spark, topicDir).filter(col("key") === key)
      .collect().headOption.map(_.getAs[Array[Byte]]("value"))
}
