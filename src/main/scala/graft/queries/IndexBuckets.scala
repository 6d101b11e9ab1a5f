package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Bucket sizing for the materialized corpus indexes (LSH / token /
  * co-purchase graph).
  *
  * NEW builds size to the session's shuffle parallelism — the setting a
  * cluster deploy already scales to its executor count — overridable via
  * `graft.index.buckets` when index layout should differ from transient
  * shuffle width. A hard-coded 32 was a straggler factory at 100 TB:
  * every bucketed index read would fan 32 tasks regardless of cluster
  * size.
  *
  * APPENDS must reuse the bucket count the table was CREATED with even
  * if the session conf has changed since (a mixed-bucket table silently
  * breaks the exchange-free join guarantees the indexes exist for), so
  * they read it back from the catalog's bucket spec.
  */
object IndexBuckets {

  def buckets(s: SparkSession): Int =
    s.conf.getOption("graft.index.buckets").map(_.toInt)
      .getOrElse(s.conf.get("spark.sql.shuffle.partitions").toInt)

  def bucketsOf(s: SparkSession, tbl: String): Int =
    s.sessionState.catalog.getTableMetadata(TableIdentifier(tbl))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(buckets(s))
}

/** Cache scope for iterative query builders: persist intermediates for
  * full reuse while the rounds run, materialize the (small) final
  * relation ONCE as a localCheckpoint, then release every persisted
  * intermediate — the returned plan reads the checkpoint, so callers
  * composing queries in a long-lived session inherit ZERO pinned
  * cache-manager entries (CacheScopeSpec), and the loop pays persist
  * prices, not per-round eager-checkpoint prices.
  */
object CacheScope {
  def scoped(persisted: Seq[org.apache.spark.sql.DataFrame])(
      result: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pinned = result.localCheckpoint(true)
    persisted.foreach(_.unpersist(): Unit)
    pinned
  }
}
