package graft.rawdata

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One Avro file of a topic, as described by its filename alone
  * (reference: AvroFileMetadata.java:53-57 and README naming section —
  * `<fromTimestamp>_<count>_<lastBlockOffset>_<firstPosition>.avro`).
  * Listing a topic is therefore a pure metadata operation: consumers can
  * prune to the files overlapping a time range without opening any of
  * them, which is what keeps a 100 TB topic seek cheap.
  */
case class TopicFile(path: String, fromTsMs: Long, count: Long, lastBlockOffset: Long, firstPosition: String)

/** Compact membership snapshot of the filenames present before a publish:
  * 8-byte md5 name-hashes instead of the names themselves, so shipping a
  * 1.5M-file topic's snapshot to writer tasks costs ~12 MB of longs, not
  * hundreds of MB of strings. A false positive (hash collision making a
  * fresh file look pre-existing → spurious loud failure) needs an 8-byte
  * md5 prefix collision — negligible at any real file count.
  */
final class PreExisting private (hashes: Set[Long]) extends Serializable {
  def contains(name: String): Boolean = hashes.contains(PreExisting.hash(name))
}

object PreExisting {
  private[rawdata] def hash(name: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(name.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(h).getLong
  }
  def of(names: Iterable[String]): PreExisting =
    new PreExisting(names.iterator.map(hash).toSet)
}

/** `wallClockWindows = false` (default): time windows cut on MESSAGE time
  * (ULID timestamps) — the deterministic, replayable choice for a
  * distributed bulk publish (the same batch always yields the same
  * files). `true`: the reference producer's max.seconds parity mode —
  * windows cut on INGEST wall time (AvroRawdataProducer.java's
  * scheduled time-based roll), so a slow trickle of messages with
  * arbitrary ULID timestamps still rolls files by elapsed producer
  * time. Wall-clock windowing lives in the client producer
  * (GraftRawdataClient.Producer — the surface with a producer
  * lifetime); bulk Topic.write treats the whole batch as one ingest
  * instant in this mode (byte-rolling still chunks it).
  */
case class TopicConfig(
    maxWindowMs: Long = 3600L * 1000,
    maxBytes: Long = 64L * 1024 * 1024,
    syncIntervalBytes: Long = 512L * 1024,
    wallClockWindows: Boolean = false)

/** Spark-native rawdata topic: a directory of Avro files sharing the
  * reference's file naming + record schema.
  *
  * All storage access goes through the Hadoop `FileSystem` API (see
  * HadoopIO), so a topic directory may live on any supported store —
  * `file://`, `gs://`, `s3a://`, `hdfs://` — behind the same code path.
  * That is the Spark-native equivalent of the reference's twin backends
  * (cloudstorage/GCSRawdataUtils.java vs filesystem/
  * FilesystemRawdataUtils.java behind one provider interface).
  *
  * Writer: one shuffle clusters messages into (time-window, byte-chunk)
  * files — the distributed equivalent of the reference producer's
  * max.seconds/max.bytes rolling (AvroRawdataProducer.java). Each task
  * streams its group through an Avro DataFileWriter with real sync blocks,
  * writing to a dot-prefixed temp name and renaming on completion (on
  * object stores the rename is a copy, matching the reference's
  * write-local-then-upload pattern).
  *
  * Reader: driver lists + prunes by filename, then one Spark task per
  * file decodes Avro → rows. Parallelism scales with file count, which is
  * how the data grows; within-file order is ULID order by construction.
  */
object Topic {

  private val TsFormat: DateTimeFormatter = DateTimeFormatter.ISO_OFFSET_DATE_TIME

  def formatTs(ms: Long): String =
    ZonedDateTime.ofInstant(Instant.ofEpochMilli(ms), ZoneOffset.UTC).format(TsFormat)

  def parseTs(s: String): Long =
    ZonedDateTime.parse(s, TsFormat).toInstant.toEpochMilli

  implicit private def msgEncoder: Encoder[RawdataMessage] = Encoders.product[RawdataMessage]
  implicit private def fileEncoder: Encoder[TopicFile] = Encoders.product[TopicFile]

  // ---------------------------------------------------------------- write

  /** Write a message DataFrame (columns id, orderingGroup, sequenceNumber,
    * position, data) as a topic directory; returns per-file metadata.
    *
    * Incremental append is supported: a second publish into an existing
    * topic adds files alongside the old ones (names differ whenever the
    * batches differ — the name is derived from the window's first message).
    * A literal re-publish of identical data fails fast on the name
    * collision rather than silently overwriting.
    */
  /** Orphaned temp files older than this are reclaimed at the next
    * publish. The age gate keeps a CONCURRENT publish's in-flight temps
    * safe (writer tasks stream for seconds, not hours); anything older
    * is debris from a crashed writer — on an object store, where the
    * commit rename is a copy+delete, a crash between the two leaves the
    * committed final name AND the stray temp (readers only ever resolve
    * committed `.avro` names, so the debris costs storage, not
    * correctness — TopicSpec's torn-rename case proves both halves).
    */
  private[graft] val TempOrphanAgeMs: Long = 3600L * 1000

  /** delete crashed-writer temp debris past the age gate (one listing,
    * best-effort — a racing delete is fine)
    */
  private def cleanOrphanTemps(fs: org.apache.hadoop.fs.FileSystem, topicDir: String): Unit = {
    val cutoff = System.currentTimeMillis() - TempOrphanAgeMs
    try fs.listStatus(new Path(topicDir)).iterator
      .filter(st => st.isFile && st.getPath.getName.startsWith(".inprogress-") &&
        st.getPath.getName.endsWith(".tmp") && st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    catch { case _: java.io.FileNotFoundException => () }
  }

  def write(messages: DataFrame, topicDir: String, cfg: TopicConfig = TopicConfig()): Seq[TopicFile] = {
    val conf = HadoopIO.conf()
    val topicFs = HadoopIO.fs(topicDir, conf)
    topicFs.mkdirs(new Path(topicDir))
    cleanOrphanTemps(topicFs, topicDir)
    val idHex = Ulid.hexOf(col("id"))
    val tsMs = Ulid.timestampMs(col("id"))
    val win = Window.partitionBy(col("_win")).orderBy(col("_ulid_hex"))

    // wall-clock mode: this publish IS one ingest instant — a single
    // time window for the whole batch (byte-rolling still chunks it)
    val winCol =
      if (cfg.wallClockWindows) lit(0L)
      else tsMs.divide(lit(cfg.maxWindowMs)).cast("long")
    // Byte-chunk assignment needs a per-window running byte total — a
    // full sort of every window. When byte rolling is effectively
    // DISABLED (maxBytes so large no window can reach an eighth of it —
    // the time-window-only configs), the chunk is provably the constant
    // 0 and the whole prefix-sum window stage (plus the per-row payload
    // byte-size aggregate feeding it) is skipped: one fewer wide stage
    // on the producer hot path.
    val byteRolling = cfg.maxBytes < Long.MaxValue / 8
    val approxBytes = expr("aggregate(map_values(data), 0L, (acc, v) -> acc + length(v))") +
      length(col("position")) + lit(48L)
    val chunked = messages
      .withColumn("_ulid_hex", idHex)
      .withColumn("_win", winCol)
    val staged = (if (byteRolling)
        chunked
          .withColumn("_bytes", approxBytes)
          .withColumn("_chunk", ((sum(col("_bytes")).over(win) - col("_bytes")) / lit(cfg.maxBytes)).cast("long"))
      else chunked.withColumn("_chunk", lit(0L)))
      .repartition(col("_win"), col("_chunk"))
      .sortWithinPartitions(col("_win"), col("_chunk"), col("_ulid_hex"))

    val sync = cfg.syncIntervalBytes
    val sconf = HadoopIO.serializable()
    // Names present before this publish, shipped into the writer tasks:
    // lets a task distinguish a genuine re-publish (dest predates the job
    // → loud failure) from its own earlier attempt under Spark task
    // retry/speculation (dest appeared during the job → already committed,
    // skip). Broadcast once as 8-byte name hashes (PreExisting), so a
    // 1.5M-file topic costs one ~12 MB broadcast, not a per-task closure
    // of full name strings.
    val pre = messages.sparkSession.sparkContext.broadcast(
      PreExisting.of(listFiles(topicDir).map(f => new Path(f.path).getName)))
    val metas = staged.toDF().mapPartitions { rows =>
      new FileGroupWriter(topicDir, sync, sconf, pre.value, rows).run()
    }.collect().toSeq
    pre.destroy()

    invalidateListing(topicDir)
    metas.sortBy(_.fromTsMs)
  }

  /** Streams one task's rows (already clustered+sorted by _win,_chunk,id)
    * into one Avro file per (_win,_chunk) group.
    */
  private final class FileGroupWriter(
      topicDir: String, syncBytes: Long, sconf: HadoopIO.SerializableConf,
      preExisting: PreExisting, rows: Iterator[Row]) {
    def run(): Iterator[TopicFile] = {
      val fs = HadoopIO.fs(topicDir, sconf.value)
      val out = Seq.newBuilder[TopicFile]
      var key: (Long, Long) = null
      var writer: AvroCodec.FileWriter = null
      var tmp: Path = null

      def finish(): Unit = if (writer != null) {
        writer.close()
        val meta = TopicFile(
          path = "",
          fromTsMs = ulidTs(writer.firstId),
          count = writer.count,
          lastBlockOffset = writer.lastBlockOffset,
          firstPosition = writer.firstPosition)
        val name = s"${formatTs(meta.fromTsMs)}_${meta.count}_${meta.lastBlockOffset}_${meta.firstPosition}.avro"
        val dest = HadoopIO.child(topicDir, name)
        commitTopicFile(fs, tmp, dest, name, preExisting)
        out += meta.copy(path = fs.makeQualified(dest).toString)
        writer = null
      }

      rows.foreach { row =>
        val k = (row.getAs[Long]("_win"), row.getAs[Long]("_chunk"))
        if (k != key) {
          finish()
          key = k
          tmp = HadoopIO.child(topicDir, s".inprogress-${UUID.randomUUID().toString.take(12)}.tmp")
          writer = new AvroCodec.FileWriter(fs.create(tmp, false), syncBytes)
        }
        writer.append(RawdataMessage(
          id = row.getAs[Array[Byte]]("id"),
          orderingGroup = Option(row.getAs[String]("orderingGroup")),
          sequenceNumber = row.getAs[Long]("sequenceNumber"),
          position = row.getAs[String]("position"),
          data = row.getAs[Map[String, Array[Byte]]]("data").map(identity)))
      }
      finish()
      out.result().iterator
    }
  }

  /** Commit a completed temp file to its deterministic destination name.
    *
    * Raw local rename would silently replace an existing file. Three
    * cases when dest already exists:
    *  - it predates this publish (`preExisting`) → genuine re-publish of
    *    identical data: fail loudly (single-writer assumption, like the
    *    reference producer);
    *  - it appeared during this publish with the expected length → an
    *    earlier attempt of this task (Spark retry/speculation) already
    *    committed it: drop the temp file and succeed, so writer tasks
    *    stay idempotent under task re-execution;
    *  - it appeared with a different length → a conflicting concurrent
    *    writer: fail. (Length is deterministic for a given row group —
    *    Avro sync markers are random bytes but fixed width — so equal
    *    length ⇒ same committed content.)
    */
  private[graft] def commitTopicFile(
      fs: org.apache.hadoop.fs.FileSystem, tmp: Path, dest: Path,
      name: String, preExisting: PreExisting): Unit = {
    if (fs.exists(dest)) {
      if (preExisting.contains(name))
        throw new IllegalStateException(s"topic file already exists (identical re-publish?): $dest")
      val destLen = fs.getFileStatus(dest).getLen
      val tmpLen = fs.getFileStatus(tmp).getLen
      if (destLen != tmpLen)
        throw new IllegalStateException(
          s"conflicting topic file from a concurrent writer ($destLen bytes, expected $tmpLen): $dest")
      fs.delete(tmp, false): Unit
    } else if (!fs.rename(tmp, dest)) {
      throw new IllegalStateException(s"rename $tmp -> $dest failed")
    }
  }

  private def ulidTs(id: Array[Byte]): Long = {
    var ts = 0L
    var i = 0
    while (i < 6) { ts = (ts << 8) | (id(i) & 0xffL); i += 1 }
    ts
  }

  // ----------------------------------------------------------------- list

  /** Metadata-only topic listing, sorted by from-timestamp. One
    * `FileSystem.listStatus` — a single LIST request on an object store
    * (the reference's GCSRawdataUtils.java prefix listing).
    */
  def listFiles(topicDir: String): Seq[TopicFile] = {
    val conf = HadoopIO.conf()
    val fs = HadoopIO.fs(topicDir, conf)
    val dir = new Path(topicDir)
    val statuses =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
    orderTies(statuses.iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .flatMap { st =>
        val base = st.getPath.getName.stripSuffix(".avro")
        val parts = base.split("_", 4)
        if (parts.length == 4)
          try Some(TopicFile(st.getPath.toString, parseTs(parts(0)), parts(1).toLong, parts(2).toLong, parts(3)))
          catch { case _: Exception => None }
        else None
      }
      .toSeq.sortBy(f => (f.fromTsMs, f.path)))
  }

  /** Files that share a fromTsMs (a byte-chunk roll within one millisecond)
    * are not ordered by the timestamp alone; re-order such runs by the
    * file's first ULID so lastMessage/pruneFrom pick the true latest chunk.
    * Only tied files are opened, and only their first record is read.
    */
  private def orderTies(files: Seq[TopicFile]): Seq[TopicFile] = {
    val anyTie = files.iterator.sliding(2).exists {
      case Seq(a, b) => a.fromTsMs == b.fromTsMs
      case _         => false
    }
    if (!anyTie) files
    else files.groupBy(_.fromTsMs).toSeq.sortBy(_._1).flatMap {
      case (_, group) if group.size == 1 => group
      case (_, group) => group.sortBy(f => firstUlidHex(f.path))
    }
  }

  /** Hex ULID of a file's first record (tie-break helper; one-record read). */
  private def firstUlidHex(path: String): String =
    AvroCodec.readFirst(path, HadoopIO.conf()).map(m => m.id.map("%02x".format(_)).mkString).getOrElse("")

  // ------------------------------------------------------- listing cache

  private val listingCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Seq[TopicFile])]()

  /** Min-interval cached listing (reference TopicAvroFileCache.java: the
    * consumer's poll loop re-lists the topic at most once per configured
    * interval). Within ttlMs of the last listing the cached snapshot is
    * returned without touching the filesystem — on an object store that
    * is the difference between one LIST per poll and one per interval.
    * Wired into the bounded receive poll (GraftRawdataClient.Consumer);
    * Topic.write invalidates after a publish from this process.
    */
  def listFilesCached(topicDir: String, ttlMs: Long): Seq[TopicFile] = {
    val now = System.nanoTime() / 1000000L
    val cached = listingCache.get(topicDir)
    if (cached != null && now - cached._1 < ttlMs) cached._2
    else {
      val fresh = listFiles(topicDir)
      listingCache.put(topicDir, (now, fresh))
      fresh
    }
  }

  /** Drop the cached listing (e.g. after this process wrote the topic). */
  def invalidateListing(topicDir: String): Unit = listingCache.remove(topicDir): Unit

  /** Files possibly containing messages with ts >= fromTsMs: everything
    * from the last file that starts at/before the target (floorEntry —
    * reference AvroRawdataConsumer.seek, :141-177).
    */
  def pruneFrom(files: Seq[TopicFile], fromTsMs: Long): Seq[TopicFile] = {
    val idx = files.lastIndexWhere(_.fromTsMs <= fromTsMs)
    if (idx < 0) files else files.drop(idx)
  }

  def pruneRange(files: Seq[TopicFile], fromTsMs: Long, toTsMs: Long): Seq[TopicFile] =
    pruneFrom(files, fromTsMs).takeWhile(_.fromTsMs <= toTsMs)

  // ----------------------------------------------------------------- read

  /** Distributed read of an explicit file list. One task per file up to a
    * scheduling-friendly cap: a 1.6M-file topic gets ~4 waves of tasks per
    * core (each decoding a run of files sequentially) instead of 1.6M
    * task launches — parallelism is bounded by cores either way, the cap
    * only bounds scheduler pressure.
    */
  def readFiles(spark: SparkSession, files: Seq[TopicFile]): Dataset[RawdataMessage] = {
    if (files.isEmpty) return spark.emptyDataset[RawdataMessage]
    val paths = files.map(_.path)
    val sconf = HadoopIO.serializable()
    val parts = math.min(paths.size, math.max(spark.sparkContext.defaultParallelism * 4, 64))
    spark.createDataset(paths)(Encoders.STRING)
      .repartition(parts)
      .flatMap(p => AvroCodec.readFile(p, sconf.value))
  }

  def read(spark: SparkSession, topicDir: String): Dataset[RawdataMessage] =
    readFiles(spark, listFiles(topicDir))

  /** Origin-attributed read: (file_path, message) rows — what the
    * integrity audit (rd_integrity) joins against the filename metadata.
    * Same distributed shape as [[readFiles]]; the extra column is the
    * task's own input path, so attribution costs nothing.
    */
  def readWithOrigin(spark: SparkSession, topicDir: String): DataFrame = {
    val files = listFiles(topicDir)
    if (files.isEmpty)
      return spark.emptyDataset(Encoders.tuple(Encoders.STRING, msgEncoder))
        .toDF("file_path", "msg")
    val paths = files.map(_.path)
    val sconf = HadoopIO.serializable()
    val parts = math.min(paths.size, math.max(spark.sparkContext.defaultParallelism * 4, 64))
    spark.createDataset(paths)(Encoders.STRING)
      .repartition(parts)
      .flatMap(p => AvroCodec.readFile(p, sconf.value).map(m => (p, m)))(
        Encoders.tuple(Encoders.STRING, msgEncoder))
      .toDF("file_path", "msg")
  }

  /** Message DataFrame with decoded ULID columns. */
  def readDF(spark: SparkSession, topicDir: String): DataFrame =
    decorate(read(spark, topicDir).toDF())

  def decorate(df: DataFrame): DataFrame = df
    .withColumn("ulid_hex", Ulid.hexOf(col("id")))
    .withColumn("ts_ms", Ulid.timestampMs(col("id")))

  /** consumer.seek(ts): pruned read of messages with ts >= fromTsMs. */
  def seek(spark: SparkSession, topicDir: String, fromTsMs: Long): DataFrame =
    decorate(readFiles(spark, pruneFrom(listFiles(topicDir), fromTsMs)).toDF())
      .filter(col("ts_ms") >= fromTsMs)

  /** cursorOf(position, approxTs, tolerance) → the message's ULID hex
    * (reference AvroRawdataClient.java:89-115): bounded time-range scan.
    */
  def positionToUlidHex(spark: SparkSession, topicDir: String, position: String,
      approxTsMs: Long, toleranceMs: Long): Option[String] = {
    val files = pruneRange(listFiles(topicDir), approxTsMs - toleranceMs, approxTsMs + toleranceMs)
    val hit = decorate(readFiles(spark, files).toDF())
      .filter(col("ts_ms").between(approxTsMs - toleranceMs, approxTsMs + toleranceMs) &&
        col("position") === position)
      .select(min(col("ulid_hex")))
      .collect()
    hit.headOption.flatMap(r => Option(r.getString(0)))
  }

  /** Resume strictly after (or at, if inclusive) a cursor ULID. */
  def afterCursor(spark: SparkSession, topicDir: String, ulidHex: String, inclusive: Boolean): DataFrame = {
    val tsMs = java.lang.Long.parseLong(ulidHex.take(12), 16)
    val pruned = pruneFrom(listFiles(topicDir), tsMs)
    val df = decorate(readFiles(spark, pruned).toDF())
    if (inclusive) df.filter(col("ulid_hex") >= ulidHex) else df.filter(col("ulid_hex") > ulidHex)
  }

  /** lastMessage(topic): only the last file is opened, and only from its
    * last Avro block (offset from the filename) — O(one block) I/O no
    * matter the topic size (reference AvroRawdataClient.java:126-147).
    */
  def lastMessage(topicDir: String): Option[RawdataMessage] = {
    val files = listFiles(topicDir)
    files.lastOption.flatMap { f =>
      val it = AvroCodec.readFileFrom(f.path, f.lastBlockOffset, HadoopIO.conf())
      var last: RawdataMessage = null
      while (it.hasNext) last = it.next()
      Option(last)
    }
  }

  /** The same, as a (tiny) DataFrame via a pruned distributed read. */
  def lastMessageDF(spark: SparkSession, topicDir: String): DataFrame = {
    val files = listFiles(topicDir)
    val lastFile = files.takeRight(1)
    decorate(readFiles(spark, lastFile).toDF())
      .orderBy(col("ulid_hex").desc)
      .limit(1)
  }

  /** Topic stats straight from the file listing — a metadata-only query. */
  def fileListingDF(spark: SparkSession, topicDir: String): DataFrame = {
    val files = listFiles(topicDir)
    spark.createDataset(files).toDF()
  }

  /** Maintenance compaction: rewrite a topic's files under a different
    * rolling config into `destDir` (typically: many small producer files
    * → fewer large analytics-friendly ones). Messages, ids and order are
    * preserved — only the file layout changes; the destination is a
    * normal topic readable by this engine or the reference client. The
    * rewrite is one distributed read + one clustered write, both through
    * the standard paths (pruning, temp-name commit), so it scales like
    * any other topic job. Writing to a NEW directory keeps the operation
    * safe under concurrent readers of the source (swap by pointer/rename
    * at a higher level once satisfied).
    */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      cfg: TopicConfig = TopicConfig()): Seq[TopicFile] =
    write(read(spark, srcDir).toDF(), destDir, cfg)

  /** Retention: delete topic files that provably contain ONLY messages
    * older than `beforeTsMs` — the log-expiry maintenance op a 100 TB
    * append-only topic needs (the reference leaves retention to GCS
    * lifecycle rules on the bucket; here it is a first-class operation).
    *
    * Two-step safety: the successor bound (fromTs(i+1) < beforeTsMs)
    * prefilters candidates from the LISTING alone — but it assumes files
    * never overlap in ULID range, and the publish API accepts
    * caller-supplied ULIDs, so a later producer session CAN write
    * messages older than an existing file's span. Each candidate is
    * therefore confirmed by its OWN upper bound: one seek to the file's
    * last block (the filename carries the offset — the lastMessage fast
    * path) reads its true last message timestamp, and the file is
    * deleted iff that is < beforeTsMs. Cost stays one LIST + one
    * last-block read + one DELETE per expired file — nothing scales with
    * message count — and an overlapping out-of-order file survives
    * instead of taking live messages with it. The newest file is never
    * deleted (nothing bounds it from above).
    */
  def expire(topicDir: String, beforeTsMs: Long): Seq[TopicFile] = {
    val files = listFiles(topicDir)
    if (files.length < 2) return Seq.empty
    val conf = HadoopIO.conf()
    val fs = HadoopIO.fs(topicDir, conf)
    val expired = files.zip(files.tail).collect {
      case (f, next) if next.fromTsMs < beforeTsMs && lastTsMs(f, conf) < beforeTsMs => f
    }
    expired.foreach(f => fs.delete(new Path(f.path), false): Unit)
    if (expired.nonEmpty) invalidateListing(topicDir)
    expired
  }

  /** timestamp of a file's LAST message — one seek to the last block via
    * the filename's offset
    */
  private def lastTsMs(f: TopicFile, conf: org.apache.hadoop.conf.Configuration): Long = {
    val it = AvroCodec.readFileFrom(f.path, f.lastBlockOffset, conf)
    var last: RawdataMessage = null
    while (it.hasNext) last = it.next()
    if (last == null) Long.MaxValue else ulidTs(last.id)
  }

  def tempDir(prefix: String): String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"), s"$prefix-${UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Local scratch dir as an explicit `file:` URI — exercises the exact
    * URI-scheme resolution a `gs://`/`s3a://` topic would take.
    */
  def tempDirUri(prefix: String): String = "file:" + tempDir(prefix)
}
