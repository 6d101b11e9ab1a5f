package graft.rawdata

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop FileSystem plumbing for topic + metadata I/O.
  *
  * The reference ships two storage backends behind one interface — GCS
  * (cloudstorage/GCSRawdataUtils.java prefix listing,
  * GCSSeekableInput.java seekable reads) and local files
  * (filesystem/FilesystemRawdataUtils.java). The Spark-native equivalent
  * is a single code path over Hadoop's `FileSystem`, which resolves
  * `file://`, `gs://`, `s3a://`, `hdfs://` ... from the URI scheme alone,
  * so a topic directory is portable across backends unmodified.
  */
object HadoopIO {

  /** Effective Hadoop configuration: the active Spark session's (it carries
    * `spark.hadoop.*` — connector credentials, endpoints), else defaults.
    * A copy is returned (never the session's live object) with the two
    * overrides this engine needs:
    *
    *  - the raw (checksum-free) local filesystem, because topic filenames
    *    embed ISO timestamps whose ':' breaks ChecksumFileSystem's relative
    *    ".<name>.crc" shadow paths (HADOOP-3257). Object-store connectors
    *    don't use checksum paths.
    *  - `fs.file.impl.disable.cache=true`, because Hadoop's FileSystem
    *    cache is keyed by scheme+authority only: if anything in the JVM
    *    already opened a `file://` path (e.g. a session not built through
    *    GraftSession), the cached ChecksumFileSystem would be returned and
    *    the impl override above silently ignored.
    *
    * Copying a Hadoop Configuration is measurably expensive (it clones the
    * full property map) and this is called on every listing/read, so the
    * copy is cached per underlying SparkContext conf and refreshed only
    * when the active session changes.
    */
  def conf(): Configuration = {
    val src = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration).orNull
    val cur = cached
    if (cur != null && (cur._1 eq src)) cur._2
    else {
      val base =
        if (src == null) new Configuration() else new Configuration(src)
      base.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      base.setBoolean("fs.file.impl.disable.cache", true)
      cached = (src, base)
      base
    }
  }

  /** (source session conf identity, derived copy) — single-slot cache. */
  @volatile private var cached: (Configuration, Configuration) = null

  /** Drop the cached derived copy. The cache is keyed by the session
    * conf's IDENTITY, so a caller that MUTATES the session's Hadoop conf
    * (e.g. registering a custom `fs.<scheme>.impl` — FaultInjectionSpec)
    * must invalidate or the stale copy keeps serving.
    */
  private[rawdata] def invalidateConfCache(): Unit = cached = null

  /** Child path by string concatenation — never `new Path(parent, child)`,
    * which URI-parses the child and rejects the ':' in topic filenames as
    * a scheme separator.
    */
  def child(dir: String, name: String): Path =
    new Path(dir.stripSuffix("/") + "/" + name)

  def fs(dir: String, c: Configuration): FileSystem = new Path(dir).getFileSystem(c)

  /** Hadoop `Configuration` is not `Serializable`; tasks that open topic
    * files on executors get the driver's effective configuration through
    * this wrapper (flattened to properties, rebuilt lazily per JVM).
    */
  final class SerializableConf(@transient c: Configuration) extends Serializable {
    private val props: Array[(String, String)] =
      c.iterator().asScala.map(e => e.getKey -> e.getValue).toArray

    @transient private lazy val rebuilt: Configuration = {
      val nc = new Configuration(false)
      props.foreach { case (k, v) => nc.set(k, v) }
      nc
    }

    def value: Configuration = rebuilt
  }

  def serializable(): SerializableConf = new SerializableConf(conf())
}
