package graft.connector

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the file-backed log store — the engine's
  * "custom Pravega source" (SURVEY.md §7.1 LogStore v2; the reference's
  * Pravega connector surface, processor.py:82,105,216): a stream is a
  * directory of immutable JSON-line segment files; the connector exposes
  * it for BATCH_READ (the reference's scan.execution.type=batch) and
  * MICRO_BATCH_READ with real offsets.
  *
  * Offset model: an offset is the sorted set of fully-consumed segment
  * file names (segments are immutable and appended whole, so file
  * granularity IS the per-segment offset; names carry no ordering
  * assumption). A micro-batch reads exactly the segments in
  * `latest -- start`, one input partition per segment — so a restart
  * from a checkpoint resumes precisely after the consumed set, and
  * executors read segments in parallel like any file scan. At scale the
  * consumed-set offset would be compacted (e.g. per-directory
  * watermarks); segment counts here are test-scale.
  *
  * Rows are `value: STRING` JSON lines; decoding to the declared schema
  * happens in the query via from_json (LogStore.decode), keeping the
  * connector schema-agnostic like a real stream store.
  */
class LogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LogTable(Option(properties.get("path")).getOrElse(
      sys.error("graft log source requires option 'path'")))

  override def supportsExternalMetadata(): Boolean = false
}

object LogSourceV2 {
  val schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = true)))

  /** Marker left by [[LogStore.compact]] recording the last compaction
    * stamp. Underscore-prefixed, so invisible to segment listings; its
    * presence lets readers/appenders distinguish "stream was compacted
    * under me" from ordinary corruption and fail with an actionable
    * message instead of FileNotFound or silent re-reads.
    */
  val CompactionMarker = "_graft_compaction"

  /** Stamp of the last compaction of `dir`, 0 if never compacted. */
  def compactionStamp(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir, CompactionMarker)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).trim.toLong
    else 0L
  }

  private[connector] def writeCompactionStamp(dir: String, stamp: Long): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, CompactionMarker), stamp.toString): Unit

  /** Tombstone of retention-deleted segment paths (one per line).
    * Distinguishes "consumed then retention-trimmed" (safe for a
    * checkpointed reader to resume over — the data was already read and
    * no rewrite exists) from "compacted" (the data was REWRITTEN into
    * new segments, so resuming would re-read it — must refuse). */
  val VacuumTombstone = "_graft_vacuumed"

  def vacuumedSegments(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(dir, VacuumTombstone)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).toSet
    else Set.empty
  }

  private[connector] def recordVacuumed(dir: String, segs: Seq[String]): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, VacuumTombstone),
      segs.mkString("", "\n", "\n"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND): Unit

  /** Data segment files in `dir`, sorted by name (no _SUCCESS/hidden). */
  def listSegments(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles())
      .map(_.toSeq
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
        .map(_.getAbsolutePath)
        .sorted)
      .getOrElse(Nil)
  }
}

final class LogTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graftlog(`$path`)"
  override def schema(): StructType = LogSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new LogScan(path) }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new LogBatchWrite(path, info.queryId())
      }
    }
}

/** V2 batch append with a two-phase commit: tasks write dot-prefixed
  * temp files (invisible to [[LogSourceV2.listSegments]]), the driver's
  * commit renames the committed tasks' files into visible segments —
  * readers never observe a partial write, task retries/speculation
  * leave only the one committed attempt, and abort deletes the temps.
  * This is the `INSERT INTO` face of the log store; the DataFrame
  * `append` keeps the built-in text sink (same commit discipline via
  * Spark's file commit protocol).
  */
final class LogBatchWrite(path: String, queryId: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    LogWriterFactory(path, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LogCommitMessage(tmp, fin) if tmp.nonEmpty =>
        java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
          java.nio.file.Paths.get(fin),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      case _ => ()
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LogCommitMessage(tmp, _) if tmp.nonEmpty =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp)): Unit
      case _ => ()
    }
}

final case class LogCommitMessage(tmpPath: String, finalPath: String)
    extends WriterCommitMessage

final case class LogWriterFactory(path: String, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // lazily created: an empty partition commits no segment
      private var out: java.io.Writer = _
      private var tmp: java.nio.file.Path = _
      private val fin = java.nio.file.Paths.get(path,
        s"segment-$queryId-$partitionId-$taskId.json")

      override def write(record: InternalRow): Unit = {
        if (out == null) {
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
          tmp = java.nio.file.Paths.get(path,
            s".tmp-$queryId-$partitionId-$taskId")
          out = java.nio.file.Files.newBufferedWriter(tmp,
            java.nio.charset.StandardCharsets.UTF_8)
        }
        // the schema's value column is nullable: a NULL payload round-
        // trips as the JSON literal `null` (from_json decodes it to a
        // null struct), never an NPE
        val v = record.getUTF8String(0)
        out.write(if (v == null) "null" else v.toString)
        out.write('\n')
      }

      override def commit(): WriterCommitMessage = {
        if (out == null) LogCommitMessage("", "")
        else { out.close(); LogCommitMessage(tmp.toString, fin.toString) }
      }

      override def abort(): Unit = if (out != null) {
        out.close()
        java.nio.file.Files.deleteIfExists(tmp): Unit
      }

      override def close(): Unit = ()
    }
}

final class LogScan(path: String) extends Scan with SupportsReportStatistics {
  override def readSchema(): StructType = LogSourceV2.schema
  override def description(): String = s"graft log scan of $path"

  /** Size statistics from segment file lengths — lets the planner make
    * broadcast decisions for small streams read through the V2 path
    * (a stats-less V2 table defaults to "huge", never broadcast). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = LogSourceV2.listSegments(path)
      .map(f => new java.io.File(f).length()).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      LogSourceV2.listSegments(path).map(LogSegmentPartition(_): InputPartition)
        .toArray
    override def createReaderFactory(): PartitionReaderFactory =
      LogSegmentReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path)
}

/** Offset = sorted set of consumed segment files, as a JSON array. */
final case class LogOffsetV2(segments: Seq[String]) extends Offset {
  override def json(): String =
    segments.sorted.map(LogOffsetV2.quote).mkString("[", ",", "]")
}

object LogOffsetV2 {
  private[connector] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def fromJson(json: String): LogOffsetV2 = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    LogOffsetV2(node.elements().asScala.map(_.asText()).toSeq)
  }
}

final case class LogSegmentPartition(file: String) extends InputPartition

/** Admission control caps each micro-batch at a bounded number of
  * segments; SupportsTriggerAvailableNow pins the end offset at query
  * start so Trigger.AvailableNow drains in proper batches (with
  * between-batch watermark advancement and the trailing no-data batch
  * that finalizes append-mode windows) instead of degrading to a single
  * Trigger.Once-style batch.
  */
final class LogMicroBatchStream(path: String) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private var availableNowEnd: Option[LogOffsetV2] = None

  override def initialOffset(): Offset = LogOffsetV2(Nil)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(LogOffsetV2(LogSourceV2.listSegments(path)))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(8)

  private def allAvailable: LogOffsetV2 =
    availableNowEnd.getOrElse(LogOffsetV2(LogSourceV2.listSegments(path)))

  override def latestOffset(): Offset =
    sys.error("latestOffset(start, limit) should be called (admission control)")

  /** Refuse to continue when checkpointed offsets name segments that no
    * longer exist: after a compaction the consumed set's file names are
    * gone, so every compacted segment would look "fresh" and the query
    * would silently RE-READ all previously consumed data; a WAL-replayed
    * batch whose END offset names deleted segments would crash mid-task
    * with a raw FileNotFound. Failing here turns both into one
    * deterministic, actionable error.
    */
  private def requireSegmentsExist(segs: Seq[String], role: String,
      tolerateVacuumed: Boolean = false): Unit = {
    var missing = segs.filterNot(f => new java.io.File(f).exists())
    // a CONSUMED segment deleted by retention vacuum is safe to resume
    // over: it was fully read and no rewritten copy exists to re-read.
    // Only exactly-tombstoned paths qualify — compaction-deleted
    // segments are not tombstoned, so that unsafe case still refuses.
    if (tolerateVacuumed && missing.nonEmpty) {
      val vacuumed = LogSourceV2.vacuumedSegments(path)
      missing = missing.filterNot(vacuumed)
    }
    if (missing.nonEmpty) {
      val stamp = LogSourceV2.compactionStamp(path)
      val cause =
        if (stamp > 0)
          s"the stream was compacted or vacuumed (marker stamp $stamp)"
        else "the segment files were removed outside the store"
      throw new IllegalStateException(
        s"graft log stream at $path: $role offset references " +
          s"${missing.size} segment(s) that no longer exist ($cause). " +
          "Resuming would duplicate or lose consumed data — restart " +
          "the query with a fresh checkpoint.")
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOff = start.asInstanceOf[LogOffsetV2]
    requireSegmentsExist(startOff.segments, "checkpoint (consumed-set)",
      tolerateVacuumed = true)
    val done = startOff.segments.toSet
    val fresh = allAvailable.segments.filterNot(done)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    LogOffsetV2((done ++ admitted).toSeq.sorted)
  }

  override def reportLatestOffset(): Offset = allAvailable

  override def deserializeOffset(json: String): Offset =
    LogOffsetV2.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val done = start.asInstanceOf[LogOffsetV2].segments.toSet
    val planned = end.asInstanceOf[LogOffsetV2].segments.filterNot(done)
    // the END offset too: a WAL-replayed first batch (end written,
    // commit missing, stream compacted while down) plans segments that
    // are gone — fail actionably, not FileNotFound inside a task
    requireSegmentsExist(done.toSeq, "checkpoint (consumed-set)",
      tolerateVacuumed = true)
    // a replayed batch NEEDS its planned segments' data: vacuumed or
    // compacted, gone is gone — never tolerated here
    requireSegmentsExist(planned, "replayed-batch")
    planned.map(LogSegmentPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    LogSegmentReaderFactory

  /** Segments are immutable and retained; nothing to release. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object LogSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[LogSegmentPartition].file
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(file, "UTF-8")
      private val lines = source.getLines()
      private var current: String = _

      override def next(): Boolean =
        if (lines.hasNext) { current = lines.next(); true } else false

      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))

      override def close(): Unit = source.close()
    }
  }
}
