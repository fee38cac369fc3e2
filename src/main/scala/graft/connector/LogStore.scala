package graft.connector

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** File-backed append-only log store — the Pravega analog (SURVEY.md §1.1).
  * Streams are named `scope/stream` (reference README.md:89-91); rows are
  * serialized as JSON lines (`format=json`, reference processor.py:86,110,
  * 221) in immutable segment files, so a stream is readable either bounded
  * (the reference's `scan.execution.type=batch`, processor.py:108,219) or
  * as a Structured Streaming source (new segments discovered per
  * micro-batch).
  *
  * Scale posture: a bounded read parallelizes across executors by
  * file/split exactly like any text scan; appends write one segment per
  * task, so there is no single-writer bottleneck. A production deployment
  * swaps the directory for the real stream store behind these same four
  * methods.
  *
  * Storage: every path resolves through the Hadoop FileSystem API
  * (r18, completing the r17 artifact-layer port) — `baseDir` may be a
  * plain local path, a `file:` URI, or any `scheme://` the deployment's
  * Hadoop config binds (HDFS, object stores), with local paths keeping
  * their historical plain spelling so offsets/stream-cuts serialized
  * before the port keep resolving (GuardSpec pins the `file:` URI
  * round-trip).
  */
final case class LogStore(baseDir: String,
    commitMode: String = LogStore.defaultCommitMode) {
  require(commitMode == "rename" || commitMode == "put",
    s"log store commitMode must be 'rename' or 'put', got '$commitMode'")

  def path(scope: String, stream: String): String = s"$baseDir/$scope/$stream"

  /** Append `df` to the stream as JSON lines — the reference's
    * stream-store JSON sink (processor.py:67-90). Tasks write through
    * the text sink into a hidden scratch dir (one file per task, no
    * single-writer bottleneck); the driver then COMMITS the files into
    * STAMPED segment names (LogSourceV2.isStamped) so streaming
    * offsets can watermark over them instead of enumerating every
    * consumed name. The commit itself is per [[commitMode]]:
    *
    *  - `rename` (default): one metadata-only rename per file — atomic
    *    on the local FS and HDFS, the strongest commit there.
    *  - `put` (r18 verdict #2, for S3-class stores where rename is a
    *    non-atomic copy a reader can half-read): each segment is
    *    written to its FINAL name through one output stream (a
    *    single-object PUT is atomic) and the whole append is published
    *    by ONE `_put-` marker object written last —
    *    [[LogSourceV2.listSegmentStatuses]] hides the segments until
    *    the marker exists, so no reader ever observes a partial or
    *    uncommitted segment, even on stores whose create() is visible
    *    mid-write. A crashed attempt's marker-less files stay
    *    invisible forever (swept by [[compact]]). The driver-side
    *    stream copy moves the segment bytes once more than rename
    *    does; a deployment whose store offers a server-side copy with
    *    atomic visibility can swap it in behind the same marker gate.
    */
  def append(df: DataFrame, scope: String, stream: String): Unit = {
    val dir = path(scope, stream)
    val tmp = s"$dir/.append-${java.util.UUID.randomUUID().toString.take(8)}"
    encode(df).write.mode(SaveMode.Overwrite).text(tmp)
    val parts = LogSourceV2.listSegments(tmp)
    val stamp = LogSourceV2.nextSegmentStamp(dir)
    // unique per-append suffix: two appenders racing to the same stamp
    // produce sibling names instead of ATOMIC_MOVE-replacing each
    // other's segments (same-stamp siblings are what the offset's
    // boundary-stamp rule exists for)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val (fsys, dirPath) = graft.Work.fs(dir)
    if (commitMode == "put")
      LogStore.putCommit(fsys, dirPath, parts, stamp, tag)
    else parts.zipWithIndex.foreach { case (f, i) =>
      val dst = new org.apache.hadoop.fs.Path(dirPath,
        f"segment-$stamp%020d-$i%05d-$tag.json")
      if (!fsys.rename(graft.Work.fs(f)._2, dst))
        throw new java.io.IOException(
          s"log segment rename failed: $f -> $dst")
    }
    graft.Work.clean(tmp)
  }

  /** Bounded scan of everything currently in the stream — the reference's
    * batch scan of a Pravega stream (processor.py:93-114, 202-225).
    * Reads the explicit segment list (same visibility rule as the V2
    * reader): a directory-path read would resolve a `_spark_metadata`
    * commit log left by [[appendStream]]'s file sink and silently skip
    * segments written by batch [[append]] into the same stream. */
  def readBounded(spark: SparkSession, scope: String, stream: String,
      schema: StructType): DataFrame = {
    val dir = path(scope, stream)
    val files = LogSourceV2.listSegments(dir)
    // empty-list directory read keeps the not-found error behavior but
    // must stay EMPTY even when the dir holds a crashed put append's
    // marker-less (invisible) files — hence the constant-false filter
    val raw = if (files.isEmpty) spark.read.text(dir).filter(lit(false))
              else spark.read.text(files: _*)
    decode(raw, schema, s"$scope/$stream")
  }

  /** Unbounded Structured Streaming scan of the stream through the
    * DataSource V2 connector (LogSourceV2): real per-segment offsets,
    * checkpoint-resumable — the engine's custom stream-store source. */
  def readStream(spark: SparkSession, scope: String, stream: String,
      schema: StructType, failOnDataLoss: Boolean = true,
      maxFilesPerTrigger: Int = 8): DataFrame =
    decode(
      spark.readStream
        .format(classOf[LogSourceProvider].getName)
        .option("path", path(scope, stream))
        .option("failOnDataLoss", failOnDataLoss.toString)
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .load(),
      schema, s"$scope/$stream")

  /** Bounded read through the same V2 connector (BATCH_READ capability)
    * — plan-identical role to [[readBounded]], witnessing that one
    * connector serves both the reference's scan.execution.type=batch
    * and the streaming path. */
  def readBoundedV2(spark: SparkSession, scope: String, stream: String,
      schema: StructType): DataFrame =
    decode(
      spark.read
        .format(classOf[LogSourceProvider].getName)
        .option("path", path(scope, stream))
        .load(),
      schema, s"$scope/$stream")

  /** Streaming append: the writeStream twin of [[append]]. Caller
    * configures trigger/checkpoint and starts the query.
    *
    * Compaction guard: a compaction deletes the file sink's
    * `_spark_metadata` commit log, so RESUMING a checkpoint created
    * before the compaction would rewrite its last batch (duplication).
    * Each checkpoint records the stream's compaction stamp when first
    * attached; re-attaching after a newer compaction throws instead of
    * silently duplicating.
    */
  def appendStream(df: DataFrame, scope: String, stream: String,
      checkpoint: String): DataStreamWriter[Row] = {
    val marker = LogSourceV2.compactionStamp(path(scope, stream))
    val (cfs, cp) = graft.Work.fs(checkpoint)
    val stampFile = new org.apache.hadoop.fs.Path(cp,
      "graft-compaction-stamp")
    if (cfs.exists(stampFile)) {
      val recorded = {
        val in = cfs.open(stampFile)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toLong
        finally in.close()
      }
      if (marker > recorded)
        throw new IllegalStateException(
          s"graft log stream $scope/$stream was compacted (stamp $marker) " +
            s"after checkpoint $checkpoint last appended (stamp $recorded); " +
            "its sink commit log is gone and resuming would duplicate the " +
            "last batch — start streaming appends with a fresh checkpoint.")
    } else {
      if (cfs.exists(cp) && marker > 0)
        throw new IllegalStateException(
          s"graft log stream $scope/$stream has been compacted but " +
            s"pre-existing checkpoint $checkpoint carries no compaction " +
            "stamp (created before the stream was compacted) — resuming " +
            "would duplicate its last batch; use a fresh checkpoint.")
      cfs.mkdirs(cp): Unit
      val out = cfs.create(stampFile, true)
      try out.write(marker.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    encode(df).writeStream
      .format("text")
      .option("path", path(scope, stream))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
  }

  /** Pravega-style stream-cut: the stream's current segment boundary.
    * Capture it now, read exactly this prefix later with
    * [[readBoundedCut]] even after further appends — bounded
    * reprocessing pinned to a moment, the log-store form of time travel
    * (an append-only log's history IS its segment set).
    */
  def streamCut(scope: String, stream: String): Seq[String] =
    LogSourceV2.listSegments(path(scope, stream))

  /** Bounded read of exactly the segments in a captured [[streamCut]].
    * Fails with an actionable error when the cut references segments a
    * later [[vacuum]]/[[compact]] removed — never a partial silent read.
    */
  def readBoundedCut(spark: SparkSession, scope: String, stream: String,
      schema: StructType, cut: Seq[String]): DataFrame = {
    val missing = cut.filterNot(f => {
      val (fsys, p) = graft.Work.fs(f)
      fsys.exists(p)
    })
    if (missing.nonEmpty) {
      val stamp = LogSourceV2.compactionStamp(path(scope, stream))
      throw new IllegalStateException(
        s"graft log stream $scope/$stream: stream-cut references " +
          s"${missing.size} segment(s) removed by " +
          (if (stamp > 0) s"compaction/vacuum (stamp $stamp)"
           else "an external deletion") +
          " — the historical version is no longer retained.")
    }
    if (cut.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else
      // ignoreMissingFiles=false pinned per-read: if a vacuum races
      // between the existence check above and the action that executes
      // this plan, the read fails LOUDLY in the task instead of
      // silently returning the surviving subset under a session-level
      // ignoreMissingFiles=true
      decode(spark.read.option("ignoreMissingFiles", "false")
        .text(cut: _*), schema, s"$scope/$stream")
  }

  /** Strictly monotonic over the previous marker (not bare clock time,
    * whose origin can step backwards across reboots/NTP) — shared stamp
    * discipline of [[compact]], [[truncate]] and [[vacuum]]. */
  private def nextStamp(dir: String): Long =
    math.max(LogSourceV2.compactionStamp(dir) + 1,
      System.currentTimeMillis())


  /** Truncate at a [[streamCut]]: delete exactly the cut's segments —
    * Pravega's truncate-at-StreamCut, the deterministic retention
    * primitive ([[vacuum]] is the count-based convenience on top).
    * Already-deleted entries are skipped (idempotent re-runs).
    *
    * Consumer interaction: deleted segments are tombstoned, so a
    * checkpointed streaming reader that already CONSUMED them resumes
    * cleanly (nothing to re-read, no forced fresh checkpoint — the
    * duplication that restart would cause is exactly what retention
    * must not trigger); a reader that still NEEDED them fails with the
    * actionable retention error.
    *
    * Fail-safe crash ordering: tombstone, then stamp, then the
    * deletes — a crash mid-way leaves the guards ARMED with no data
    * removed (spurious refusal at worst), never removed data with
    * disarmed guards (the silent last-batch duplication an unstamped
    * `_spark_metadata` loss would let an appendStream checkpoint
    * commit).
    */
  def truncate(scope: String, stream: String, cut: Seq[String])
      : Seq[String] = {
    val dir = path(scope, stream)
    val existing = LogSourceV2.listSegments(dir).toSet
    val targets = cut.filter(existing)
    if (targets.isEmpty) return Nil
    val stamp = nextStamp(dir)
    LogSourceV2.recordVacuumed(dir, targets, stamp)
    LogSourceV2.writeCompactionStamp(dir, stamp)
    targets.foreach { f =>
      val (fsys, p) = graft.Work.fs(f)
      fsys.delete(p, false): Unit
    }
    // a streaming sink's commit log names deleted files — remove it so
    // directory-path readers can't resolve a stale view (same rule as
    // compact(); old appendStream checkpoints are refused via the stamp)
    graft.Work.clean(s"$dir/_spark_metadata")
    targets
  }

  /** Retention vacuum: delete the oldest segments, keeping the newest
    * `keepSegments` — the count-based retention trim (Kafka-style).
    * "Oldest" is by file modification time with a name tie-break, which
    * is approximate on coarse-mtime filesystems; when exactness matters
    * (tests, replays), capture a [[streamCut]] before appending newer
    * data and [[truncate]] at it instead. Returns the deleted paths.
    */
  def vacuum(scope: String, stream: String, keepSegments: Int): Seq[String] = {
    require(keepSegments >= 0, "keepSegments must be >= 0")
    val dir = path(scope, stream)
    val segs = LogSourceV2.listSegmentStatuses(dir)
      .sortBy(st => (st.getModificationTime, st.getPath.getName))
    if (segs.size <= keepSegments) return Nil
    truncate(scope, stream, segs.dropRight(keepSegments)
      .map(st => LogSourceV2.spell(st.getPath)))
  }

  /** Compact a stream's segments into `target` merged segments — the
    * small-files maintenance every log/stream store needs (thousands of
    * tiny appends → scan overhead dominated by file metadata). Contents
    * are byte-identical lines, only the file layout changes: merged
    * segments are written to a hidden scratch dir (invisible to
    * readers), the old segments removed, the merged ones renamed in.
    * NOT concurrency-safe with a live streaming reader whose offsets
    * name the old segment files — run in a maintenance window, like any
    * log-store compaction.
    */
  def compact(spark: SparkSession, scope: String, stream: String,
      target: Int = 1): Unit = {
    require(target > 0)
    val dir = path(scope, stream)
    val segs = LogSourceV2.listSegments(dir)
    if (segs.size <= target) return
    // RAW pre-compaction name snapshot (r19 review): the put-residue
    // sweep at the end must only ever touch names that existed BEFORE
    // this compaction started — a concurrent put append's fresh
    // segments and marker land after this listing and survive intact
    val rawBefore: Set[String] = {
      val (f0, d0) = graft.Work.fs(dir)
      f0.listStatus(d0).iterator.filter(_.isFile)
        .map(_.getPath.getName).toSet
    }
    val tmp = s"$dir/.compact-tmp"
    // read the EXPLICIT segment list (a directory read would honor a
    // streaming sink's _spark_metadata log and miss batch-appended
    // segments — merging a subset while deleting all would lose data);
    // the write action fully materializes the read before anything is
    // deleted; dot-prefixed scratch is invisible to Spark file listings
    spark.read.text(segs: _*).coalesce(target)
      .write.mode(SaveMode.Overwrite).text(tmp)
    val merged = LogSourceV2.listSegments(tmp)
    // stamp BEFORE the destructive phase (fail-safe, same rule as
    // truncate): a crash after the stamp but before the rewrite leaves
    // the stream intact with the guards armed — a spurious refusal at
    // worst. The former stamp-LAST order had a window (rewrite done,
    // stamp missing) in which an appendStream checkpoint's `marker >
    // recorded` guard stayed disarmed and would silently rewrite its
    // last batch. Strict monotonicity over the previous marker (see
    // nextStamp) also keeps compacted segment names collision-free
    // across compactions.
    val stamp = nextStamp(dir)
    LogSourceV2.writeCompactionStamp(dir, stamp)
    // publish the merged segments IN before deleting the olds: a crash
    // in between leaves transient duplication (at-least-once, the log
    // contract), never data loss — the delete-first order would strand
    // the only copy in the hidden scratch dir. The publish honors
    // [[commitMode]] (r19 review): in put mode the merged files are
    // single-streamed to final put-gated names — a rename here would
    // re-open the exact half-readable-copy hazard put mode exists to
    // close ("no rename anywhere on the visible path").
    val (fsys, dirPath) = graft.Work.fs(dir)
    if (commitMode == "put")
      // graceGuard = false: the compaction stamp above already
      // invalidates checkpointed readers, and this copy moves the
      // WHOLE merged stream — the append-sized grace cannot apply
      LogStore.putCommit(fsys, dirPath, merged, stamp,
        java.util.UUID.randomUUID().toString.take(8),
        graceGuard = false)
    else merged.zipWithIndex.foreach { case (f, i) =>
      val dst = new org.apache.hadoop.fs.Path(dirPath,
        s"compacted-$stamp-$i")
      if (!fsys.rename(graft.Work.fs(f)._2, dst))
        throw new java.io.IOException(
          s"compacted segment rename failed: $f -> $dst")
    }
    segs.foreach { f =>
      val (sfs, p) = graft.Work.fs(f)
      sfs.delete(p, false): Unit
    }
    // clear scratch (now only _SUCCESS markers and empty dirs), and any
    // streaming-sink commit log: it names only the deleted pre-compaction
    // files, so leaving it would shadow the compacted segments from
    // directory-path readers. Re-attaching an OLD appendStream checkpoint
    // to a compacted stream is unsupported (its sink log is gone) — start
    // streaming appends to a compacted stream with a fresh checkpoint.
    graft.Work.clean(tmp)
    graft.Work.clean(s"$dir/_spark_metadata")
    // prune the vacuum tombstones (round-4 advice: the file grew without
    // bound): compaction already invalidates every checkpoint via the
    // stamp guard, so no surviving reader can reference the entries
    fsys.delete(new org.apache.hadoop.fs.Path(dirPath,
      LogSourceV2.VacuumTombstone), false): Unit
    // sweep put-commit residue (r18 verdict #2), snapshot-scoped and
    // re-verified against the CURRENT listing — see
    // [[LogStore.sweepPutResidue]] for the two-direction rule and the
    // committed-between-snapshots race it closes (r19 ADVICE).
    LogStore.sweepPutResidue(fsys, dirPath, rawBefore)
  }

  private def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  // (companion holds the shared put-commit implementation)

  /** JSON-line decode with a LOUD malformed-line guard: a truncated
    * segment tail or a non-JSON line must fail naming the stream, not
    * parse to an all-null row (permissive from_json's default — silent
    * wrong results, the failure mode that actually costs at 100 TB;
    * round-7 verdict #6). A valid JSON object MISSING fields still
    * null-fills (schema evolution stays tolerant); only unparseable
    * text trips the corrupt-record column. The guard lives in a FILTER
    * so ColumnPruning cannot drop the check, and raise_error keeps the
    * whole decode inside codegen.
    */
  private def decode(raw: DataFrame, schema: StructType,
      label: String): DataFrame = {
    val corrupt = "_graft_corrupt"
    val wide = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    raw
      .select(from_json(col("value"), wide,
        Map("columnNameOfCorruptRecord" -> corrupt)).as("r"))
      .filter(
        when(col(s"r.$corrupt").isNotNull,
          raise_error(concat(
            lit(s"graft log stream $label: malformed JSON segment line " +
              "(truncated write or foreign file in the stream dir): "),
            substring(col(s"r.$corrupt"), 1, 120))).cast("boolean"))
          .otherwise(lit(true)))
      .select("r.*").drop(corrupt)
  }
}

/** Pluggable transport for put-commit's staging→final byte move (r19
  * verdict #2): the default STREAMS the segment bytes through this JVM
  * twice (read staging + write final) — correct everywhere, but on an
  * object store the same move is a server-side, metadata-speed call
  * (S3 CopyObject / multipart copy, GCS rewrite, HDFS concat for
  * block-aligned files). A deployment registers a provider for its
  * destination scheme once at startup
  * ([[LogStore.registerCopyProvider]]); the commit DISCIPLINE —
  * final names, trailing marker, grace guard, residue sweep — is
  * transport-independent and stays in [[LogStore.putCommit]].
  *
  * Contract: when `put` returns, `dst` holds exactly `src`'s bytes
  * and `src` is consumed (deleted). `dst` may be visible mid-write on
  * stores without atomic create — put mode tolerates that by design
  * (the `_put-` marker, written after every provider call returned,
  * is the only visibility gate). A provider that fails must throw;
  * partial `dst` bytes are then invisible crashed-append residue. */
trait SegmentCopyProvider {
  def put(srcFs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dstFs: org.apache.hadoop.fs.FileSystem,
      dst: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Unit
}

object LogStore {
  /** Deployment-level default commit mode: `-Dgraft.log.commitMode=put`
    * flips every store constructed without an explicit mode — the knob
    * an object-store deployment sets once. */
  def defaultCommitMode: String =
    sys.props.getOrElse("graft.log.commitMode", "rename")

  /** The default transport: stream the bytes through this JVM
    * (read + write), delete the staging file — works on every
    * Hadoop FileSystem. */
  val StreamCopy: SegmentCopyProvider =
    (srcFs, src, dstFs, dst, conf) =>
      org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dst,
        true, true, conf): Unit

  private val copyProviders = new java.util.concurrent
    .ConcurrentHashMap[String, SegmentCopyProvider]

  /** Register the put-commit byte transport for a destination
    * filesystem scheme (e.g. an S3 server-side CopyObject provider
    * for "s3a"). One registration at deployment startup covers every
    * store and compaction in the JVM. */
  def registerCopyProvider(scheme: String,
      p: SegmentCopyProvider): Unit =
    copyProviders.put(scheme, p): Unit

  /** Remove a registered transport (tests; falls back to
    * [[StreamCopy]]). */
  def clearCopyProvider(scheme: String): Unit =
    copyProviders.remove(scheme): Unit

  private def copyProviderFor(
      dstFs: org.apache.hadoop.fs.FileSystem): SegmentCopyProvider = {
    val scheme = Option(dstFs.getUri.getScheme).getOrElse("file")
    copyProviders.getOrDefault(scheme, StreamCopy)
  }

  /** The put commit (r18 verdict #2), shared by [[LogStore.append]]
    * and the V2 [[LogBatchWrite]]: stream each staged file to its
    * final put-named segment (one create per segment — a single-object
    * PUT on the stores this mode targets), close every stream, THEN
    * write the append's `_put-` marker. The marker is the atomic
    * publish: [[LogSourceV2.listSegmentStatuses]] hides put-named
    * segments until it exists. Staged sources are deleted as they are
    * copied. */
  private[connector] def putCommit(
      fsys: org.apache.hadoop.fs.FileSystem,
      dirPath: org.apache.hadoop.fs.Path,
      staged: Seq[String], stamp: Long, tag: String,
      graceGuard: Boolean = true): Unit = {
    val provider = copyProviderFor(fsys)
    staged.zipWithIndex.foreach { case (f, i) =>
      val dst = new org.apache.hadoop.fs.Path(dirPath,
        f"segment-$stamp%020d-$i%05d-$tag-p.json")
      val (sfs, sp) = graft.Work.fs(f)
      provider.put(sfs, sp, fsys, dst, fsys.getConf)
    }
    if (staged.nonEmpty) {
      // r19 ADVICE: the watermark grace window was sized for
      // rename-mode commit latency, but a put append streams its full
      // data bytes between the stamp and the marker — a large or slow
      // copy can push the marker past the grace, and the segment would
      // sort under an already-advanced watermark and be silently
      // treated as consumed (the late-landing listing diff only
      // WARNS). Detect it HERE, before visibility: withholding the
      // marker leaves the staged bytes as invisible crashed-append
      // residue (the next compact sweeps them) — a loud, retryable
      // failure instead of a silent skip. Warn from half the window so
      // deployments size -Dgraft.log.watermarkGraceMs before it trips.
      // An inflated stamp (> wall clock, from a future-stamped
      // predecessor) is never watermark-eligible, so negative ages are
      // naturally exempt. `graceGuard = false` exempts COMPACTION
      // (r20 review): its stamp-to-marker window contains the byte
      // copy of the entire merged stream, not one append, and the
      // watermark hazard cannot apply there — the compaction stamp is
      // written BEFORE the copy and already invalidates every
      // checkpointed reader; gating it would make put-mode compaction
      // of any large stream fail permanently.
      val age = System.currentTimeMillis() - stamp
      val grace = LogSourceV2.WatermarkGraceMs
      if (graceGuard && age >= (grace * 4) / 5)
        throw new java.io.IOException(
          s"put-commit to $dirPath: $age ms elapsed between the " +
            s"segment stamp and the marker write — at or past 80% of " +
            s"the $grace ms watermark grace, so a reader could advance " +
            "its watermark over this stamp before the marker lands and " +
            "silently never read the append. The staged data is left " +
            "INVISIBLE (marker withheld; the next compact sweeps it). " +
            "Raise -Dgraft.log.watermarkGraceMs above the worst-case " +
            "append copy time and retry")
      if (graceGuard && age >= grace / 2)
        System.err.println(s"[graft] WARNING put-commit to $dirPath: " +
          s"$age ms from stamp to marker — past half the $grace ms " +
          "watermark grace; commitMode=put pays its data-copy latency " +
          "inside the commit window, so size " +
          "-Dgraft.log.watermarkGraceMs above the worst-case append " +
          "copy time")
      fsys.create(new org.apache.hadoop.fs.Path(dirPath,
        f"${LogSourceV2.PutMarkerPrefix}$stamp%020d-$tag"), true).close()
    }
  }

  /** Sweep put-commit residue after a compaction. `rawBefore` is the
    * RAW pre-compaction name snapshot — nothing that landed after it
    * is ever touched. Within the snapshot, BOTH directions re-verify
    * against the CURRENT listing (r19 ADVICE — the former
    * unconditional marker branch lost data): a put append that
    * committed between the compaction's visible-segment listing and
    * the rawBefore listing has its `_put-` marker inside the snapshot
    * but its segments still LIVE — they were invisible when the
    * victim set was taken, so they were never compacted. Deleting
    * that marker would orphan the committed data (invisible forever)
    * and the NEXT compact would then sweep the marker-less files as
    * crashed residue: silent loss of a committed append. The rule is
    * therefore:
    *   - a `_put-` marker is swept only when NO surviving file
    *     carries its put key (all its segments were compacted away);
    *   - a put-named data file is swept only while its marker is
    *     STILL absent (a crashed append's invisible residue — a
    *     marker that landed mid-compaction keeps its files alive).
    * One extra listStatus per compaction; all-or-nothing per key is
    * guaranteed by the listing gate (an append's segments become
    * visible together when their single marker lands). */
  private[graft] def sweepPutResidue(
      fsys: org.apache.hadoop.fs.FileSystem,
      dirPath: org.apache.hadoop.fs.Path,
      rawBefore: Set[String]): Unit = {
    val nowNames = fsys.listStatus(dirPath).iterator
      .filter(_.isFile).map(_.getPath.getName).toSet
    val markersNow = nowNames.filter(_.startsWith(LogSourceV2.PutMarkerPrefix))
    val liveKeys = nowNames.iterator
      .flatMap(n => LogSourceV2.putKey(n)).toSet
    rawBefore.foreach { n =>
      val sweep =
        if (n.startsWith(LogSourceV2.PutMarkerPrefix))
          !liveKeys.contains(n.stripPrefix(LogSourceV2.PutMarkerPrefix))
        else LogSourceV2.putKey(n).exists { k =>
          // snapshot check, then a LIVE re-check immediately before
          // the delete: an append slower than this whole compaction
          // could land its marker between the listing above and here —
          // one exists() per apparently-pending file (rare) shrinks
          // that window to the single RPC
          !markersNow.contains(LogSourceV2.PutMarkerPrefix + k) &&
          !fsys.exists(new org.apache.hadoop.fs.Path(dirPath,
            LogSourceV2.PutMarkerPrefix + k))
        }
      if (sweep)
        fsys.delete(new org.apache.hadoop.fs.Path(dirPath, n),
          false): Unit
    }
  }
}
