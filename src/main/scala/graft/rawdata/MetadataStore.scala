package graft.rawdata

import java.io.File

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
  */
object MetadataStore {

  private def storeDir(topicDir: String): String =
    new File(topicDir, "metadata").getAbsolutePath

  def readAll(spark: SparkSession, topicDir: String): DataFrame = {
    val dir = new File(storeDir(topicDir))
    if (!dir.exists())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.BinaryType))))
    else spark.read.parquet(dir.getAbsolutePath)
  }

  /** Upsert entries; `updates` must have columns (key string, value binary). */
  def put(spark: SparkSession, topicDir: String, updates: DataFrame): Unit = {
    val existing = readAll(spark, topicDir)
    val merged = updates.select(col("key"), col("value"))
      .unionByName(existing.join(updates.select(col("key")), Seq("key"), "left_anti"))
    val tmp = storeDir(topicDir) + ".staging"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val dest = new File(storeDir(topicDir))
    // Swap via java.nio Files.move, which throws on failure instead of the
    // silent-boolean File.renameTo. Single-writer assumption (like the
    // reference's metadata clients): concurrent puts are not coordinated,
    // but a reader never sees a half-written store — the parquet write
    // completes before the directory move, and the dest→old / tmp→dest
    // window is the narrowest the filesystem allows.
    import java.nio.file.{Files, StandardCopyOption}
    if (dest.exists()) {
      val old = new File(storeDir(topicDir) + ".old")
      deleteRec(old)
      Files.move(dest.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
      Files.move(new File(tmp).toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
      deleteRec(old)
    } else Files.move(new File(tmp).toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
  }

  def keys(spark: SparkSession, topicDir: String): Seq[String] =
    readAll(spark, topicDir).select("key").collect().map(_.getString(0)).toSeq.sorted

  def get(spark: SparkSession, topicDir: String, key: String): Option[Array[Byte]] =
    readAll(spark, topicDir).filter(col("key") === key)
      .collect().headOption.map(_.getAs[Array[Byte]]("value"))

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
