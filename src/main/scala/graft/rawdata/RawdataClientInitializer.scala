package graft.rawdata

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Provider-registration surface (reference: RawdataClientInitializer
  * implementations GCSRawdataClientInitializer.java /
  * FilesystemAvroRawdataClientInitializer.java, registered through
  * `META-INF/services/no.ssb.rawdata.api.RawdataClientInitializer`).
  *
  * The reference ships TWO providers ("gcs", "filesystem") because it has
  * two storage backends; graft's Hadoop-FileSystem code path collapses
  * them into ONE provider whose `base-dir` URI scheme selects the backend
  * (`file://`, `gs://`, `s3a://`, ...). Discovery is the same JDK
  * ServiceLoader mechanism, so a host application configured to load
  * rawdata providers by id can load this one the same way.
  */
trait RawdataClientInitializer {
  /** stable id a host app selects the provider by */
  def providerId: String

  /** configuration keys this provider understands */
  def configurationKeys: Set[String]

  /** Build a client from string configuration (reference initialize(Map)).
    * The SparkSession is resolved from the environment — the reference's
    * equivalent ambient dependency is its storage SDK credentials.
    */
  def initialize(config: Map[String, String]): GraftRawdataClient
}

/** The one graft provider: any Hadoop-resolvable base URI.
  *
  * Config keys mirror the reference's (GCSRawdataClientInitializer.java
  * configurationKeys): `avro-file.max.seconds/max.bytes/sync.interval`
  * govern the producer's file rolling; `listing.min-interval-seconds` the
  * consumer poll cache; `base-dir` replaces the bucket/folder pair.
  */
final class GraftClientInitializer extends RawdataClientInitializer {

  override val providerId: String = "graft-spark"

  override val configurationKeys: Set[String] = Set(
    "base-dir",
    "avro-file.max.seconds",
    "avro-file.max.bytes",
    "avro-file.sync.interval",
    "listing.min-interval-seconds")

  override def initialize(config: Map[String, String]): GraftRawdataClient = {
    val spark = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException("no active SparkSession to bind the rawdata client to"))
    val base = config.getOrElse("base-dir",
      throw new IllegalArgumentException("missing required configuration key: base-dir"))
    val cfg = TopicConfig(
      maxWindowMs = config.get("avro-file.max.seconds").map(_.toLong * 1000).getOrElse(TopicConfig().maxWindowMs),
      maxBytes = config.get("avro-file.max.bytes").map(_.toLong).getOrElse(TopicConfig().maxBytes),
      syncIntervalBytes = config.get("avro-file.sync.interval").map(_.toLong).getOrElse(TopicConfig().syncIntervalBytes))
    val pollMs = config.get("listing.min-interval-seconds").map(_.toLong * 1000).getOrElse(100L)
    new GraftRawdataClient(spark, base, cfg, pollMs)
  }
}

/** ServiceLoader-backed lookup (the reference's ProviderRegistry role). */
object RawdataClientFactory {

  def providers(): Seq[RawdataClientInitializer] =
    java.util.ServiceLoader.load(classOf[RawdataClientInitializer]).iterator().asScala.toSeq

  def create(providerId: String, config: Map[String, String]): GraftRawdataClient =
    providers().find(_.providerId == providerId)
      .getOrElse(throw new IllegalArgumentException(
        s"no rawdata provider '$providerId' on the classpath (available: ${providers().map(_.providerId).mkString(", ")})"))
      .initialize(config)
}
