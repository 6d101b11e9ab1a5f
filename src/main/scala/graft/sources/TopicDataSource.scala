package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.rawdata.{AvroCodec, HadoopIO, Topic, TopicFile}

/** DataSource V2 connector for rawdata topics:
  * `spark.read.format("graft-topic").load(dir)`.
  *
  * This is the Spark-first re-expression of the reference consumer's seek
  * path (AvroRawdataConsumer.java:141-177 floorEntry file pruning): the
  * declarative route. `Topic.seek` prunes manually; here the SAME pruning
  * happens inside Catalyst — any `ts_ms` range predicate a user writes
  * (plain filter, join pushdown, partition of a larger query) reaches
  * `planInputPartitions` and drops non-overlapping files BEFORE any byte
  * is read, and column pruning skips decoding the payload map when only
  * metadata columns are selected. One file = one InputPartition, so scan
  * parallelism tracks the data like the rest of the engine.
  *
  * Filters are reported but also left as residuals (Spark re-evaluates
  * them row-by-row): file pruning is a containment bound, not an exact
  * answer, because a file only bounds its messages' timestamps from below.
  */
class TopicDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-topic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TopicDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new TopicTable(Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-topic requires .load(<topic dir>)")))

  override def supportsExternalMetadata(): Boolean = false
}

object TopicDataSource {
  /** message schema + the decoded ULID columns (ts_ms is what pushdown
    * prunes on — same order as Topic.decorate emits)
    */
  val Schema: StructType = StructType(Seq(
    StructField("id", BinaryType, nullable = false),
    StructField("orderingGroup", StringType, nullable = true),
    StructField("sequenceNumber", LongType, nullable = false),
    StructField("position", StringType, nullable = false),
    StructField("data", MapType(StringType, BinaryType), nullable = false),
    StructField("ulid_hex", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false)))
}

final class TopicTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-topic(`$path`)"
  override def schema(): StructType = TopicDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TopicScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TopicWriteBuilder(path, info)
}

final class TopicScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var loMs: Long = Long.MinValue
  private var hiMs: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TopicDataSource.Schema

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case GreaterThan("ts_ms", v) => asLong(v).exists { l => loMs = math.max(loMs, l + 1); true }
      case GreaterThanOrEqual("ts_ms", v) => asLong(v).exists { l => loMs = math.max(loMs, l); true }
      case LessThan("ts_ms", v) => asLong(v).exists { l => hiMs = math.min(hiMs, l - 1); true }
      case LessThanOrEqual("ts_ms", v) => asLong(v).exists { l => hiMs = math.min(hiMs, l); true }
      case EqualTo("ts_ms", v) => asLong(v).exists { l => loMs = math.max(loMs, l); hiMs = math.min(hiMs, l); true }
      case _ => false
    }
    pushed = accepted
    // everything stays residual: pruning is a file-level containment bound
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new TopicScan(path, loMs, hiMs, required)
}

final class TopicScan(path: String, loMs: Long, hiMs: Long, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-topic $path [ts_ms in ${if (loMs == Long.MinValue) "-inf" else loMs}..${if (hiMs == Long.MaxValue) "+inf" else hiMs}]"

  /** the pruned file list — the reference's floorEntry seek, at plan time */
  private def prunedFiles(): Seq[TopicFile] = {
    val all = Topic.listFiles(path)
    val fromLo = if (loMs == Long.MinValue) all else Topic.pruneFrom(all, loMs)
    if (hiMs == Long.MaxValue) fromLo else fromLo.takeWhile(_.fromTsMs <= hiMs)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val sconf = HadoopIO.serializable()
    val files = prunedFiles().map(_.path)
    // one file per partition up to a scheduling-friendly cap; beyond it,
    // contiguous runs of files share a partition (a 1.6M-file topic
    // should not cost 1.6M task launches — parallelism is bounded by
    // cores either way)
    val maxParts = math.max(
      org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism * 4, 64)
    val groups =
      if (files.size <= maxParts) files.map(Seq(_))
      else {
        val per = math.ceil(files.size.toDouble / maxParts).toInt
        files.grouped(per).toSeq
      }
    groups.map(g => TopicInputPartition(g, sconf): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TopicMicroBatchStream(path, loMs, hiMs, required, checkpointLocation)
}

/** Micro-batch tail of a topic — the consumer's poll loop
  * (reference AvroRawdataConsumer.java:71-96) as a DSv2 stream: each
  * trigger lists the topic (one LIST per trigger, like the reference's
  * TopicAvroFileCache interval) and the newly landed files become that
  * micro-batch's partitions. Topic files appear atomically (temp-name
  * rename), so per-file discovery can neither lose nor split a file.
  *
  * Offsets index this stream's DISCOVERY ORDER (files sorted by name can
  * land out of ULID order under a distributed publish; discovery order is
  * append-only, which offsets must be). The discovery log is DURABLE: it
  * is rewritten under the query's checkpoint location before a new
  * latestOffset is announced, so Spark can only commit a batch whose
  * file list survives a restart — delivery is exactly-once across
  * restarts (the mapping offset index → file path is stable). A log that
  * no longer covers a checkpointed offset fails loudly instead of
  * silently dropping files.
  */
final class TopicMicroBatchStream(
    path: String, loMs: Long, hiMs: Long, required: StructType, checkpointLocation: String)
    extends MicroBatchStream {

  private val logPath = HadoopIO.child(checkpointLocation, "graft-discovery.log")
  private val logTmp = HadoopIO.child(checkpointLocation, ".graft-discovery.log.tmp")

  private val discovered = scala.collection.mutable.ArrayBuffer.empty[String]
  private val known = scala.collection.mutable.HashSet.empty[String]
  loadLog()

  /** restore the discovery order persisted by a previous run (falls back
    * to the temp file if a crash landed between delete and rename)
    */
  private def loadLog(): Unit = {
    val fs = HadoopIO.fs(checkpointLocation, HadoopIO.conf())
    val src = if (fs.exists(logPath)) Some(logPath)
      else if (fs.exists(logTmp)) Some(logTmp) else None
    src.foreach { p =>
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { f =>
        if (known.add(f)) discovered += f
      }
    }
  }

  /** rewrite the log (tiny: one line per file) — called only when the
    * discovery order grew, BEFORE the new offset is announced
    */
  private def saveLog(): Unit = {
    val fs = HadoopIO.fs(checkpointLocation, HadoopIO.conf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(checkpointLocation))
    val out = fs.create(logTmp, true)
    try out.write(discovered.mkString("", "\n", "\n").getBytes("UTF-8")) finally out.close()
    if (fs.exists(logPath)) fs.delete(logPath, false)
    if (!fs.rename(logTmp, logPath))
      throw new IllegalStateException(s"failed to persist discovery log $logPath")
  }

  private def discover(): Unit = synchronized {
    val all = Topic.listFiles(path)
    val fromLo = if (loMs == Long.MinValue) all else Topic.pruneFrom(all, loMs)
    val inRange = if (hiMs == Long.MaxValue) fromLo else fromLo.takeWhile(_.fromTsMs <= hiMs)
    var grew = false
    inRange.foreach { f =>
      if (known.add(f.path)) { discovered += f.path; grew = true }
    }
    if (grew) saveLog()
  }

  override def initialOffset(): Offset = TopicOffset(0)

  override def latestOffset(): Offset = {
    discover()
    synchronized(TopicOffset(discovered.size))
  }

  override def deserializeOffset(json: String): Offset = TopicOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TopicOffset].n.toInt, end.asInstanceOf[TopicOffset].n.toInt)
    val slice = synchronized {
      if (e > discovered.size)
        throw new IllegalStateException(
          s"discovery log covers ${discovered.size} files but the checkpoint references offset $e " +
            s"— checkpoint/log mismatch for $logPath")
      discovered.slice(s, e).toArray
    }
    val sconf = HadoopIO.serializable()
    slice.map(p => TopicInputPartition(Seq(p), sconf): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = new TopicReaderFactory(required)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final case class TopicOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final case class TopicInputPartition(filePaths: Seq[String], sconf: HadoopIO.SerializableConf) extends InputPartition

final class TopicReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TopicInputPartition]
    new TopicPartitionReader(p.filePaths, p.sconf, required)
  }
}

/** Decodes a run of topic Avro files to InternalRows, materializing only
  * the columns the scan requires (the payload map is the expensive one).
  */
final class TopicPartitionReader(filePaths: Seq[String], sconf: HadoopIO.SerializableConf, required: StructType)
    extends PartitionReader[InternalRow] {

  private val it = filePaths.iterator.flatMap(p => AvroCodec.readFile(p, sconf.value))
  private var row: InternalRow = _

  private val fieldGetters: Array[graft.rawdata.RawdataMessage => Any] =
    required.fields.map { f =>
      f.name match {
        case "id" => (m: graft.rawdata.RawdataMessage) => m.id
        case "orderingGroup" => (m: graft.rawdata.RawdataMessage) =>
          m.orderingGroup.map(UTF8String.fromString).orNull
        case "sequenceNumber" => (m: graft.rawdata.RawdataMessage) => m.sequenceNumber
        case "position" => (m: graft.rawdata.RawdataMessage) => UTF8String.fromString(m.position)
        case "data" => (m: graft.rawdata.RawdataMessage) =>
          ArrayBasedMapData(
            m.data.keysIterator.map(UTF8String.fromString).toArray[Any],
            m.data.valuesIterator.toArray[Any])
        case "ulid_hex" => (m: graft.rawdata.RawdataMessage) =>
          UTF8String.fromString(m.id.map("%02x".format(_)).mkString)
        case "ts_ms" => (m: graft.rawdata.RawdataMessage) => tsOf(m.id)
        case other => throw new IllegalArgumentException(s"unknown topic column: $other")
      }
    }

  private def tsOf(id: Array[Byte]): Long = {
    var ts = 0L
    var i = 0
    while (i < 6) { ts = (ts << 8) | (id(i) & 0xffL); i += 1 }
    ts
  }

  override def next(): Boolean =
    if (it.hasNext) {
      val m = it.next()
      row = InternalRow.fromSeq(fieldGetters.map(_(m)).toIndexedSeq)
      true
    } else false

  override def get(): InternalRow = row

  override def close(): Unit = () // AvroCodec's iterator closes itself at exhaustion
}
