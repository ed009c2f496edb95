package graft.sources.datadb

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}

/** DataSource V2 WRITE path for real Cassandra big-format sstables:
  * `df.write.format("sstable-data").option("path", dir).mode("append")
  * .save()` materializes the engine's cell relation as complete sstables —
  * Data.db in the 'nb' row codec plus EVERY sidecar (Index/Statistics/
  * Filter/Summary/Digest/TOC and CompressionInfo or CRC), one sstable per
  * distinct `sstable_id`, via the same per-task kernel the q128 bulk
  * export proved ([[CassandraDataFixture.writeSstableFrom]] — the role
  * Cassandra's CQLSSTableWriter plays for its bulk loader).
  *
  * Spark-native grouping: the Write declares
  * [[RequiresDistributionAndOrdering]] — clustered distribution on
  * `sstable_id` plus an ascending sort — so CATALYST plans the shuffle
  * and sort that co-locate each sstable's cells; the writer just rolls to
  * a new sstable when the id changes. No groupByKey/mapGroups driver
  * plumbing, and AQE/skew handling apply to the exchange like any other.
  *
  * Write schema (validated by name; extra columns like the read side's
  * `is_counter`/`is_live` are ignored — counter-ness is a column TYPE in
  * the real format and liveness is derived):
  * `sstable_id string` ("sst-<n>" → generation n+1, mirroring the read
  * side's nb-<gen>-big ↔ sst-<gen-1> mapping), `key long`,
  * `clustering long`, `column_name string`, `kind string`,
  * `timestamp_us long`, `ttl_s long`, `local_deletion_time_s long`,
  * `is_tombstone boolean`, `is_expiring boolean`, `size_bytes long`.
  * Option `compressed` (default true) selects LZ4-chunked +
  * CompressionInfo.db vs plain + CRC.db.
  *
  * Commit protocol: each task writes to a task-LOCAL temp directory and
  * uploads through the Hadoop FS on task commit (so the destination may
  * be a DFS path); job-level abort deletes every file named in a
  * successful task commit. Like Cassandra's own bulk loader, a task
  * killed mid-upload can leave partial files that a re-run overwrites —
  * bulk-export semantics, not a transactional table format. */
final class DataDbWriteBuilder(options: Map[String, String],
    info: LogicalWriteInfo) extends WriteBuilder {

  override def build(): Write = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("sstable-data write requires a path"))
    // CaseInsensitiveStringMap lower-cases option keys
    val schemaMode = options.getOrElse("schema", DataDbWrite.SchemaCells)
    if (schemaMode != DataDbWrite.SchemaCells &&
        schemaMode != DataDbWrite.SchemaFeature)
      throw new IllegalArgumentException(
        s"sstable-data write schema option must be " +
          s"${DataDbWrite.SchemaCells} or ${DataDbWrite.SchemaFeature}, " +
          s"got $schemaMode")
    val feature = schemaMode == DataDbWrite.SchemaFeature
    if (feature && options.get("compressed").exists(_.toBoolean))
      throw new IllegalArgumentException(
        "sstable-data feature-schema writes are uncompressed (CRC.db)")
    val compressed = !feature && options.get("compressed").forall(_.toBoolean)
    val schema = info.schema()
    val required =
      if (feature) DataDbWrite.FeatureRequiredFields
      else DataDbWrite.RequiredFields
    required.foreach { case (name, tpe) =>
      val idx = schema.fieldNames.indexOf(name)
      if (idx < 0) throw new IllegalArgumentException(
        s"sstable-data write schema is missing column $name: $tpe")
      if (schema.fields(idx).dataType != tpe)
        throw new IllegalArgumentException(
          s"sstable-data write column $name must be $tpe, got " +
            schema.fields(idx).dataType)
    }
    val vIdx = schema.fieldNames.indexOf("value")
    if (vIdx >= 0 && schema.fields(vIdx).dataType !=
        org.apache.spark.sql.types.BinaryType)
      throw new IllegalArgumentException(
        "sstable-data write column value must be BinaryType, got " +
          schema.fields(vIdx).dataType)
    // malformed numerics surface as the sink's IllegalArgumentException
    // convention (naming the option), not a bare NumberFormatException
    val spillRows = options.get("spillrows").map(v =>
      v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"sstable-data write option spillrows must be an int, got '$v'")))
      .getOrElse(DataDbWrite.DefaultSpillRows)
    require(spillRows > 0, s"spillrows must be positive, got $spillRows")
    val spillBytes = options.get("spillbytes").map(v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"sstable-data write option spillbytes must be a long, got '$v'")))
      .getOrElse(DataDbWrite.DefaultSpillBytes)
    require(spillBytes > 0, s"spillbytes must be positive, got $spillBytes")
    // sstable level stamped into each output's Statistics.db (real LCS
    // persists the level there — a leveled compaction writing its
    // outputs at L0 would be re-selected as fresh flushes by the very
    // strategy that produced them)
    val level = options.get("level").map(v =>
      v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"sstable-data write option level must be an int, got '$v'")))
      .getOrElse(0)
    require(level >= 0, s"level must be non-negative, got $level")
    if (feature && level != 0)
      throw new IllegalArgumentException(
        "sstable-data feature-schema writes do not take a level")
    new DataDbWrite(path, schema, compressed, spillRows, spillBytes,
      feature, level)
  }
}

object DataDbWrite {

  /** Rows buffered in task heap before a sorted run spills to local disk
    * (option `spillRows`). Bounds the write path's memory at
    * O(spillRows + partitions) per task regardless of output sstable
    * size — a multi-GB generation becomes sorted runs + a k-way merge
    * into the one-pass streaming kernel, the external-sort shape
    * Cassandra's own writer reaches via flush thresholds. */
  val DefaultSpillRows: Int = 1 << 20

  /** Byte companion to `spillRows` (option `spillBytes`): rows are a
    * proxy — large cell values could blow the buffer long before the row
    * cap — so the buffer also spills when its MODELED resident size
    * (fixed per-row envelope + column-name + value bytes) crosses this.
    * Whichever cap trips first wins. */
  val DefaultSpillBytes: Long = 256L << 20

  /** Spilled-run counter (diagnostics; specs assert the spill path
    * actually engaged under a small threshold). */
  val spills = new java.util.concurrent.atomic.LongAdder()
  val RequiredFields: Seq[(String, org.apache.spark.sql.types.DataType)] = Seq(
    "sstable_id" -> StringType,
    "key" -> LongType,
    "clustering" -> LongType,
    "column_name" -> StringType,
    "kind" -> StringType,
    "timestamp_us" -> LongType,
    "ttl_s" -> LongType,
    "local_deletion_time_s" -> LongType,
    "is_tombstone" -> BooleanType,
    "is_expiring" -> BooleanType,
    "size_bytes" -> LongType)

  private val IdPattern = "sst-(\\d+)".r

  /** "sst-<n>" → generation n+1 (the read side maps nb-<gen>-big files
    * back to sst-<gen-1> ids). */
  def generationOf(sstableId: String): Long = sstableId match {
    case IdPattern(n) => n.toLong + 1L
    case other => throw new IllegalArgumentException(
      s"sstable_id '$other' is not of the form sst-<n>")
  }

  /** `schema` option values: the default cell-event relation (the 'nb'
    * c0/c1 schema) or the FEATURE event vocabulary (round 11) — typed
    * deletion/liveness/static events written through
    * [[CassandraDataFixture.writeFeatureCompacted]], the write surface
    * the executed deletion-shadowing compaction flows through. */
  val SchemaCells = "cells"
  val SchemaFeature = "feature"

  /** Feature-schema write relation: the scan's own event vocabulary
    * (`kind` ∈ CELL/STATIC_CELL/ROW_LIVENESS/ROW_DELETION/
    * COMPLEX_DELETION/PARTITION_DELETION) with a decoded long `key`;
    * cell payloads ride the optional binary `value` column. */
  val FeatureRequiredFields: Seq[(String, org.apache.spark.sql.types.DataType)] =
    Seq(
      "sstable_id" -> StringType,
      "key" -> LongType,
      "clustering" -> LongType,
      "column_name" -> StringType,
      "kind" -> StringType,
      "timestamp_us" -> LongType,
      "ttl_s" -> LongType,
      "local_deletion_time_s" -> LongType)

  private val FbIdPattern = "fb-(\\d+)".r

  /** "fb-<n>" → output shard n (feature-schema files are named
    * fb-<shard>-big by the kernel). */
  def featureShardOf(sstableId: String): Long = sstableId match {
    case FbIdPattern(n) => n.toLong
    case other => throw new IllegalArgumentException(
      s"sstable_id '$other' is not of the form fb-<n>")
  }
}

final class DataDbWrite(path: String, schema: StructType,
    compressed: Boolean, spillRows: Int = DataDbWrite.DefaultSpillRows,
    spillBytes: Long = DataDbWrite.DefaultSpillBytes,
    feature: Boolean = false, level: Int = 0)
    extends Write with RequiresDistributionAndOrdering {

  override def description(): String =
    s"DataDbWrite path=$path compressed=$compressed spillRows=$spillRows" +
      s" spillBytes=$spillBytes" +
      (if (feature) " schema=feature" else "") +
      (if (level != 0) s" level=$level" else "")

  /** Co-locate each sstable's cells on one task... */
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("sstable_id")))

  /** ...and sort within the task so the writer sees each id as one
    * contiguous run (it rolls files on id change). */
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.identity("sstable_id"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  override def toBatch: BatchWrite = new DataDbBatchWrite(path, schema,
    compressed,
    DataDbScan.confEntries(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())), spillRows, spillBytes, feature,
    level)
}

/** Names of the destination files one task uploaded. */
final case class DataDbCommit(files: Seq[String]) extends WriterCommitMessage

final class DataDbBatchWrite(path: String, schema: StructType,
    compressed: Boolean, confEntries: Array[(String, String)],
    spillRows: Int = DataDbWrite.DefaultSpillRows,
    spillBytes: Long = DataDbWrite.DefaultSpillBytes,
    feature: Boolean = false, level: Int = 0)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DataDbWriterFactory(path, schema, compressed, confEntries,
      spillRows, spillBytes, feature, level)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    messages.collect { case DataDbCommit(files) =>
      files.foreach(f => fs.delete(new Path(dir, f), false))
    }
  }
}

final class DataDbWriterFactory(path: String, schema: StructType,
    compressed: Boolean, confEntries: Array[(String, String)],
    spillRows: Int = DataDbWrite.DefaultSpillRows,
    spillBytes: Long = DataDbWrite.DefaultSpillBytes,
    feature: Boolean = false, level: Int = 0)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    if (feature) new FeatureSstableWriter(path, schema, confEntries,
      spillRows, spillBytes)
    else new SstableDataWriter(path, schema, compressed, confEntries,
      spillRows, spillBytes, level)
}

/** Rolls one real sstable per contiguous `sstable_id` run (the Write's
  * required ordering makes runs total). Task memory is SPILL-BOUNDED
  * (round 11): cells buffer up to `spillRows`, then sort and spill as a
  * run file to task-local disk; on generation roll the runs and the
  * in-memory tail k-way-merge (all already in the kernel's stream
  * order) into [[CassandraDataFixture.writeSstableFromSortedValues]],
  * which writes the sstable in ONE streaming pass. Header minima are
  * running accumulators. Live heap is O(spillRows + partitions) per
  * task no matter how large the output sstable — the external-sort
  * shape Cassandra's own writer reaches via memtable flush thresholds. */
final class SstableDataWriter(destDir: String, schema: StructType,
    compressed: Boolean, confEntries: Array[(String, String)],
    spillRows: Int = DataDbWrite.DefaultSpillRows,
    spillBytes: Long = DataDbWrite.DefaultSpillBytes,
    level: Int = 0)
    extends DataWriter[InternalRow] {

  private type T = (Long, Long, String, Boolean, Long, Long, Long,
    Boolean, Boolean, Long, Array[Byte])

  // field ordinals resolved ONCE (write() runs per row — a string-keyed
  // map lookup per field there is pure hot-path overhead)
  private def ord(n: String): Int = schema.fieldNames.indexOf(n)
  private val idOrd = ord("sstable_id")
  private val keyOrd = ord("key")
  private val clOrd = ord("clustering")
  private val colOrd = ord("column_name")
  private val kindOrd = ord("kind")
  private val tsOrd = ord("timestamp_us")
  private val ttlOrd = ord("ttl_s")
  private val ldtOrd = ord("local_deletion_time_s")
  private val tombOrd = ord("is_tombstone")
  private val expOrd = ord("is_expiring")
  private val sizeOrd = ord("size_bytes")
  // OPTIONAL value passthrough: when the incoming relation carries a
  // binary `value` column, non-null cell values are stored verbatim
  // (read-back length = value length); null falls back to the
  // deterministic size_bytes blob
  private val valueOrd: Int = ord("value")

  private val tmp = java.nio.file.Files.createTempDirectory("graft-sst-write")
  private var currentId: String = null
  private val seenIds = scala.collection.mutable.HashSet.empty[String]
  private val buf = new ArrayBuffer[T]()
  private val spill = new SpillRuns[T](
    CassandraDataFixture.ValueTupleOrdering,
    (out, t) => {
      out.writeLong(t._1); out.writeLong(t._2); out.writeUTF(t._3)
      out.writeBoolean(t._4)
      out.writeLong(t._5); out.writeLong(t._6); out.writeLong(t._7)
      out.writeBoolean(t._8); out.writeBoolean(t._9); out.writeLong(t._10)
      if (t._11 == null) out.writeInt(-1)
      else { out.writeInt(t._11.length); out.write(t._11) }
    },
    in => {
      val k = in.readLong(); val cl = in.readLong(); val col = in.readUTF()
      val mk = in.readBoolean()
      val ts = in.readLong(); val ttl = in.readLong(); val ldt = in.readLong()
      val tb = in.readBoolean(); val ex = in.readBoolean()
      val sz = in.readLong()
      val vlen = in.readInt()
      val v =
        if (vlen < 0) null
        else { val b = new Array[Byte](vlen); in.readFully(b); b }
      (k, cl, col, mk, ts, ttl, ldt, tb, ex, sz, v)
    })
  // running EncodingStats minima for the CURRENT generation (the array
  // path's whole-buffer folds, computed as rows arrive)
  private var minTs = Long.MaxValue
  private var minLdt = Long.MaxValue // over deleted/expiring events
  private var minTtl = Long.MaxValue // over expiring events

  override def write(row: InternalRow): Unit = {
    val id = row.getUTF8String(idOrd).toString
    if (currentId != null && id != currentId) flush()
    currentId = id
    val kind = row.getUTF8String(kindOrd).toString
    if (kind != DataDbFormat.KindCell && kind != DataDbFormat.KindMarker)
      throw new IllegalArgumentException(
        s"sstable-data write: unknown kind '$kind' (expected " +
          s"${DataDbFormat.KindCell} or ${DataDbFormat.KindMarker})")
    val size = row.getLong(sizeOrd)
    if (size < 0)
      throw new IllegalArgumentException(
        s"sstable-data write: negative size_bytes $size")
    val value =
      if (valueOrd < 0 || row.isNullAt(valueOrd)) null
      else row.getBinary(valueOrd)
    val ts = row.getLong(tsOrd)
    val ttl = row.getLong(ttlOrd)
    val ldt = row.getLong(ldtOrd)
    val tomb = row.getBoolean(tombOrd)
    val exp = row.getBoolean(expOrd)
    if (ts < minTs) minTs = ts
    if ((tomb || exp) && ldt < minLdt) minLdt = ldt
    if (exp && ttl < minTtl) minTtl = ttl
    val col = row.getUTF8String(colOrd).toString
    buf += ((row.getLong(keyOrd), row.getLong(clOrd),
      col, kind == DataDbFormat.KindMarker, ts, ttl, ldt, tomb, exp, size,
      value))
    bufBytes += 64L + col.length + (if (value == null) 0 else value.length)
    if (buf.length >= spillRows || bufBytes >= spillBytes) {
      spill.spillRun(buf); bufBytes = 0L
    }
  }

  private var bufBytes = 0L

  private def flush(): Unit =
    if (currentId != null && (buf.nonEmpty || !spill.isEmpty)) {
      // the Write's required ordering makes each id ONE contiguous run; a
      // repeat would silently overwrite the earlier sstable's files, so it
      // is a hard error (sorted-input contract violated upstream)
      if (!seenIds.add(currentId))
        throw new IllegalStateException(
          s"sstable_id '$currentId' arrived in multiple runs — " +
            "input not sorted by sstable_id")
      buf.sortInPlace()(CassandraDataFixture.ValueTupleOrdering)
      CassandraDataFixture.writeSstableFromSortedValues(tmp,
        DataDbWrite.generationOf(currentId), spill.mergedWith(buf.iterator),
        minTs,
        if (minLdt == Long.MaxValue) CassandraDataFormat.NoDeletionTimeS
        else minLdt,
        if (minTtl == Long.MaxValue) 0L else minTtl,
        compressed, level)
      spill.clearRuns()
      buf.clear()
      bufBytes = 0L
      minTs = Long.MaxValue; minLdt = Long.MaxValue; minTtl = Long.MaxValue
    }

  override def commit(): WriterCommitMessage = {
    flush()
    val msg = StagedUpload.commitDir(tmp, destDir, confEntries)
    spill.close()
    msg
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    buf.clear()
    spill.close()
    StagedUpload.discardDir(tmp)
  }
}

/** Task-local external-sort runs, shared by both sstable writers: the
  * caller's buffer spills as a sorted run file when its caps trip, and on
  * generation roll the runs k-way-merge with the sorted in-memory tail
  * into one stream in the shared ordering. Run INPUT streams are tracked
  * and closed by [[close]] even when a downstream consumer throws
  * mid-merge — an aborted task leaks no fds while the JVM (and its other
  * running tasks) live on. Run files live OUTSIDE the upload dir, so a
  * task commit never ships them. */
private[datadb] final class SpillRuns[T](ordering: Ordering[T],
    writeOne: (java.io.DataOutputStream, T) => Unit,
    readOne: java.io.DataInputStream => T) {

  private val dir = java.nio.file.Files.createTempDirectory("graft-sst-spill")
  private final case class Run(file: java.io.File, rows: Long)
  private var runs = List.empty[Run]
  private val open = scala.collection.mutable.Set.empty[java.io.Closeable]

  def isEmpty: Boolean = runs.isEmpty

  /** Run input streams currently open (spec probe for the no-fd-leak
    * contract). */
  private[datadb] def openStreams: Int = open.size

  /** Sort the buffer in place, write it as one run file, clear it. */
  def spillRun(buf: ArrayBuffer[T]): Unit = {
    buf.sortInPlace()(ordering)
    val f = java.nio.file.Files.createTempFile(dir, "run-", ".spill").toFile
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 16))
    try buf.foreach(writeOne(out, _)) finally out.close()
    runs = Run(f, buf.length.toLong) :: runs
    DataDbWrite.spills.increment()
    buf.clear()
  }

  private def runIterator(r: Run): Iterator[T] = new Iterator[T] {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(
        new java.io.FileInputStream(r.file), 1 << 16))
    open += in
    private var remaining = r.rows
    override def hasNext: Boolean = remaining > 0
    override def next(): T = {
      remaining -= 1
      val t = readOne(in)
      if (remaining == 0) { in.close(); open -= in }
      t
    }
  }

  /** K-way merge (heap of head elements) of the runs with the ALREADY
    * sorted in-memory tail — the runs tile the generation's multiset, so
    * the merged stream is total in `ordering`. */
  def mergedWith(tail: Iterator[T]): Iterator[T] =
    if (runs.isEmpty) tail
    else new Iterator[T] {
      private val its = (tail +: runs.map(runIterator)).toArray
      private val pq = new scala.collection.mutable.PriorityQueue[(T, Int)]()(
        Ordering.by[(T, Int), T](_._1)(ordering).reverse)
      its.indices.foreach(i =>
        if (its(i).hasNext) pq.enqueue((its(i).next(), i)))
      override def hasNext: Boolean = pq.nonEmpty
      override def next(): T = {
        val (t, i) = pq.dequeue()
        if (its(i).hasNext) pq.enqueue((its(i).next(), i))
        t
      }
    }

  /** Delete the consumed run files after a successful generation write. */
  def clearRuns(): Unit = { runs.foreach(_.file.delete()); runs = Nil }

  /** Close any still-open run streams and remove files + dir — children
    * first, so a run delete that failed earlier surfaces as a leftover
    * file swept here, never as commit-time DirectoryNotEmptyException. */
  def close(): Unit = {
    open.foreach(c => try c.close()
      catch { case _: java.io.IOException => () })
    open.clear()
    runs = Nil
    StagedUpload.discardDir(dir)
  }
}

/** The staging/upload half both sstable writers share: a task-local temp
  * dir whose complete files ship through the Hadoop FS on task commit
  * (DFS targets work; job abort deletes committed files). */
private[datadb] object StagedUpload {

  def commitDir(tmp: java.nio.file.Path, destDir: String,
      confEntries: Array[(String, String)]): DataDbCommit = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val dest = new Path(destDir)
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest)
    val files = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .toSeq.sortBy(_.getName)
    files.foreach { f =>
      val out = fs.create(new Path(dest, f.getName), true)
      try java.nio.file.Files.copy(f.toPath, out) finally out.close()
      f.delete()
    }
    java.nio.file.Files.deleteIfExists(tmp)
    DataDbCommit(files.map(_.getName))
  }

  def discardDir(dir: java.nio.file.Path): Unit = {
    Option(dir.toFile.listFiles()).foreach(_.foreach(_.delete()))
    java.nio.file.Files.deleteIfExists(dir)
    ()
  }
}

/** FEATURE-schema writer (round 11): rolls one real feature-schema
  * sstable (static rows, pk liveness, row/complex/partition deletions,
  * path-ordered complex cells + the complete sidecar family) per
  * contiguous `sstable_id` run. Task memory is SPILL-BOUNDED exactly
  * like the cells writer (round 13): events buffer up to
  * `spillRows`/`spillBytes`, then sort in
  * [[CassandraDataFixture.FeatureTupleOrdering]] and spill as a run
  * file; on shard roll the runs and the in-memory tail k-way-merge into
  * [[CassandraDataFixture.writeFeatureCompactedSorted]], whose kernel
  * consumes one clustering group at a time — live heap is
  * O(spillRows + runs + one row's events) no matter how large the
  * output shard, so the volume-adaptive fan-out's MaxOutputShards
  * backstop capping shard size no longer risks the writer's memory. */
final class FeatureSstableWriter(destDir: String, schema: StructType,
    confEntries: Array[(String, String)],
    spillRows: Int = DataDbWrite.DefaultSpillRows,
    spillBytes: Long = DataDbWrite.DefaultSpillBytes)
    extends DataWriter[InternalRow] {

  // field ordinals resolved once (see SstableDataWriter)
  private def ord(n: String): Int = schema.fieldNames.indexOf(n)
  private val idOrd = ord("sstable_id")
  private val keyOrd = ord("key")
  private val clOrd = ord("clustering")
  private val colOrd = ord("column_name")
  private val kindOrd = ord("kind")
  private val tsOrd = ord("timestamp_us")
  private val ttlOrd = ord("ttl_s")
  private val ldtOrd = ord("local_deletion_time_s")
  private val valueOrd: Int = ord("value")

  private val tmp = java.nio.file.Files.createTempDirectory("graft-sst-write")
  private var currentId: String = null
  private val seenIds = scala.collection.mutable.HashSet.empty[String]
  private val buf = new ArrayBuffer[CassandraDataFixture.FeatureEv]()
  private var bufBytes = 0L
  private val spill = new SpillRuns[CassandraDataFixture.FeatureEv](
    CassandraDataFixture.FeatureTupleOrdering,
    (out, t) => {
      out.writeLong(t._1); out.writeLong(t._2)
      out.writeUTF(t._3); out.writeUTF(t._4)
      out.writeLong(t._5); out.writeLong(t._6); out.writeLong(t._7)
      if (t._8 == null) out.writeInt(-1)
      else { out.writeInt(t._8.length); out.write(t._8) }
    },
    in => {
      val k = in.readLong(); val cl = in.readLong()
      val col = in.readUTF(); val kind = in.readUTF()
      val ts = in.readLong(); val ttl = in.readLong(); val ldt = in.readLong()
      val vlen = in.readInt()
      val v =
        if (vlen < 0) null
        else { val b = new Array[Byte](vlen); in.readFully(b); b }
      (k, cl, col, kind, ts, ttl, ldt, v)
    })

  override def write(row: InternalRow): Unit = {
    val id = row.getUTF8String(idOrd).toString
    if (currentId != null && id != currentId) flush()
    currentId = id
    val value =
      if (valueOrd < 0 || row.isNullAt(valueOrd)) null
      else row.getBinary(valueOrd)
    val col = row.getUTF8String(colOrd).toString
    val kind = row.getUTF8String(kindOrd).toString
    buf += ((row.getLong(keyOrd), row.getLong(clOrd), col, kind,
      row.getLong(tsOrd), row.getLong(ttlOrd),
      row.getLong(ldtOrd), value))
    bufBytes += 64L + col.length + kind.length +
      (if (value == null) 0 else value.length)
    if (buf.length >= spillRows || bufBytes >= spillBytes) {
      spill.spillRun(buf); bufBytes = 0L
    }
  }

  private def flush(): Unit =
    if (currentId != null && (buf.nonEmpty || !spill.isEmpty)) {
      if (!seenIds.add(currentId))
        throw new IllegalStateException(
          s"sstable_id '$currentId' arrived in multiple runs — " +
            "input not sorted by sstable_id")
      buf.sortInPlace()(CassandraDataFixture.FeatureTupleOrdering)
      CassandraDataFixture.writeFeatureCompactedSorted(tmp,
        DataDbWrite.featureShardOf(currentId),
        spill.mergedWith(buf.iterator))
      spill.clearRuns()
      buf.clear()
      bufBytes = 0L
    }

  override def commit(): WriterCommitMessage = {
    flush()
    val msg = StagedUpload.commitDir(tmp, destDir, confEntries)
    spill.close()
    msg
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    buf.clear()
    spill.close()
    StagedUpload.discardDir(tmp)
  }
}
