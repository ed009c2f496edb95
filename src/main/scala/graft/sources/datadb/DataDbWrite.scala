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
    val compressed = options.get("compressed").forall(_.toBoolean)
    val schema = info.schema()
    DataDbWrite.RequiredFields.foreach { case (name, tpe) =>
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
    new DataDbWrite(path, schema, compressed)
  }
}

object DataDbWrite {
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
}

final class DataDbWrite(path: String, schema: StructType, compressed: Boolean)
    extends Write with RequiresDistributionAndOrdering {

  override def description(): String =
    s"DataDbWrite path=$path compressed=$compressed"

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
        .getOrElse(new Configuration())))
}

/** Names of the destination files one task uploaded. */
final case class DataDbCommit(files: Seq[String]) extends WriterCommitMessage

final class DataDbBatchWrite(path: String, schema: StructType,
    compressed: Boolean, confEntries: Array[(String, String)])
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DataDbWriterFactory(path, schema, compressed, confEntries)

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
    compressed: Boolean, confEntries: Array[(String, String)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new SstableDataWriter(path, schema, compressed, confEntries)
}

/** Rolls one real sstable per contiguous `sstable_id` run (the Write's
  * required ordering makes runs total). Buffers ONE generation's cells at
  * a time — the same per-sstable granularity the read side's tasks hold,
  * and exactly what [[CassandraDataFixture.writeSstableFrom]] needs to
  * sort rows/cells and derive the SerializationHeader minima. */
final class SstableDataWriter(destDir: String, schema: StructType,
    compressed: Boolean, confEntries: Array[(String, String)])
    extends DataWriter[InternalRow] {

  private val ord: Map[String, Int] =
    DataDbWrite.RequiredFields.map { case (n, _) =>
      n -> schema.fieldNames.indexOf(n)
    }.toMap
  // OPTIONAL value passthrough: when the incoming relation carries a
  // binary `value` column, non-null cell values are stored verbatim
  // (read-back length = value length); null falls back to the
  // deterministic size_bytes blob
  private val valueOrd: Int = schema.fieldNames.indexOf("value")

  private val tmp = java.nio.file.Files.createTempDirectory("graft-sst-write")
  private var currentId: String = null
  private val seenIds = scala.collection.mutable.HashSet.empty[String]
  private val buf = new ArrayBuffer[(Long, Long, String, Boolean, Long,
    Long, Long, Boolean, Boolean, Long, Array[Byte])]()

  override def write(row: InternalRow): Unit = {
    val id = row.getUTF8String(ord("sstable_id")).toString
    if (currentId != null && id != currentId) flush()
    currentId = id
    val kind = row.getUTF8String(ord("kind")).toString
    if (kind != DataDbFormat.KindCell && kind != DataDbFormat.KindMarker)
      throw new IllegalArgumentException(
        s"sstable-data write: unknown kind '$kind' (expected " +
          s"${DataDbFormat.KindCell} or ${DataDbFormat.KindMarker})")
    val size = row.getLong(ord("size_bytes"))
    if (size < 0)
      throw new IllegalArgumentException(
        s"sstable-data write: negative size_bytes $size")
    val value =
      if (valueOrd < 0 || row.isNullAt(valueOrd)) null
      else row.getBinary(valueOrd)
    buf += ((row.getLong(ord("key")), row.getLong(ord("clustering")),
      row.getUTF8String(ord("column_name")).toString,
      kind == DataDbFormat.KindMarker,
      row.getLong(ord("timestamp_us")), row.getLong(ord("ttl_s")),
      row.getLong(ord("local_deletion_time_s")),
      row.getBoolean(ord("is_tombstone")),
      row.getBoolean(ord("is_expiring")), size, value))
  }

  private def flush(): Unit = if (currentId != null && buf.nonEmpty) {
    // the Write's required ordering makes each id ONE contiguous run; a
    // repeat would silently overwrite the earlier sstable's files, so it
    // is a hard error (sorted-input contract violated upstream)
    if (!seenIds.add(currentId))
      throw new IllegalStateException(
        s"sstable_id '$currentId' arrived in multiple runs — " +
          "input not sorted by sstable_id")
    CassandraDataFixture.writeSstableFromValues(tmp,
      DataDbWrite.generationOf(currentId), buf.iterator, compressed)
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush()
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

  override def abort(): Unit = close()

  override def close(): Unit = {
    buf.clear()
    Option(tmp.toFile.listFiles()).foreach(_.foreach(_.delete()))
    java.nio.file.Files.deleteIfExists(tmp)
  }
}
