package graft.sources.statsdb

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for raw SSTable metadata files:
  * `spark.read.format("sstable-stats").load(dirOrFile)` yields one row per
  * Statistics.db file — the zero-data-read access path behind the
  * reference's `summary`/`sstables` commands (CassandraBackend.java:89-123).
  * Completes the raw-binary trio next to `sstable-index` (pstats) and
  * `sstable-data` (cfstats/purge): all five reference commands now run off
  * binary SSTable files.
  *
  * Scale behavior:
  *  - one row per FILE and O(100 B) files: planning cost dominates, so many
  *    files are batched into one input partition (no per-file task overhead
  *    when a node carries 100k sstables);
  *  - `sstable_id` equality/IN predicates prune files at planning time (F1);
  *  - column pruning projects parsed fields without materializing the rest.
  */
class StatsDbDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "sstable-stats"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatsDbDataSource.schemaFor(
      Option(options.get("format")).getOrElse("graft"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsDbTable(properties.asScala.toMap)
}

object StatsDbDataSource {
  /** `format` option: "graft" (default) = the engine's TOC format;
    * "cassandra" = the real Cassandra "nb" MetadataSerializer encoding
    * ([[CassandraStatsFormat]]). The two formats expose different schemas —
    * the real file carries no keyspace/table/strategy (Cassandra derives
    * those from the directory) but carries the full StatsMetadata field
    * set. */
  def schemaFor(format: String): StructType = format match {
    case "cassandra" => CassandraStatsFormat.Schema
    case _ => StatsDbFormat.Schema
  }
}

final class StatsDbTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"sstable_stats(${properties.getOrElse("path", "")})"
  override def schema(): StructType =
    StatsDbDataSource.schemaFor(properties.getOrElse("format", "graft"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StatsDbScanBuilder(options.asScala.toMap)
}

final class StatsDbScanBuilder(options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType =
    StatsDbDataSource.schemaFor(options.getOrElse("format", "graft"))
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** sstable_id (graft schema) / generation (cassandra schema)
    * equality/IN filters prune files; all filters stay residual
    * (row-level re-check on pruned input is free). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("sstable_id", _) => true
      case In("sstable_id", _) => true
      case EqualTo("generation", _) => true
      case In("generation", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = StatsDbScan(
    options.getOrElse("path",
      throw new IllegalArgumentException("sstable-stats requires a path")),
    required, pushed,
    // lower-case keys: options come from a CaseInsensitiveStringMap
    options.get("filesperpartition").map(_.toInt).getOrElse(512),
    options.getOrElse("format", "graft"),
    options.get("gcbefore").map(_.toLong).getOrElse(0L))
}

final case class StatsDbScan(path: String, required: StructType,
    pushed: Array[Filter], filesPerPartition: Int,
    format: String = "graft", gcBeforeS: Long = 0L) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StatsDbScan path=$path pushed=${pushed.mkString(",")} " +
      (if (runtime.nonEmpty) s"RuntimeFilters=${runtime.mkString(",")} "
       else "") +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  /** RUNTIME file pruning (round 13, the IndexDb pattern): when a join
    * realizes the relevant id set — graft schema by `sstable_id`,
    * cassandra schema by `generation` — only surviving files are ever
    * opened (planInputPartitions runs after filter()). */
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(if (format == "cassandra") "generation" else "sstable_id"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case EqualTo("sstable_id", _) => true
      case In("sstable_id", _) => true
      case EqualTo("generation", _) => true
      case In("generation", _) => true
      case _ => false
    }

  private def sstableIdOf(fileName: String): String =
    fileName.stripSuffix(StatsDbFormat.Suffix)

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  private def fileSurvives(id: String): Boolean = {
    // cassandra descriptors are "nb-<gen>-big"; non-descriptor names
    // never match a generation filter (conservative: kept, re-checked
    // at row level)
    lazy val gen: Option[Long] =
      id.split("-").lift(1).flatMap(_.toLongOption)
    (pushed ++ runtime).forall {
      case EqualTo("sstable_id", v) => id == v
      case In("sstable_id", vs) => vs.contains(id)
      case EqualTo("generation", v) =>
        asLong(v).forall(g => gen.forall(_ == g))
      case In("generation", vs) =>
        gen.forall(g => vs.flatMap(asLong).contains(g))
      case _ => true
    }
  }

  private def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(sessionHadoopConf())
    val status = fs.getFileStatus(p)
    val files =
      if (status.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(StatsDbFormat.Suffix))
      else Seq(status)
    files
      .map(s => (s.getPath.toString, sstableIdOf(s.getPath.getName)))
      .filter { case (_, id) => fileSurvives(id) }
      .sortBy(_._2)
      // tiny files: batch many per task so task count tracks work, not #files
      .grouped(math.max(1, filesPerPartition))
      .map(g => StatsDbInputPartition(g.toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = sessionHadoopConf()
    val entries = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new StatsDbReaderFactory(required, entries, format, gcBeforeS)
  }
}

final case class StatsDbInputPartition(files: Array[(String, String)])
    extends InputPartition

final class StatsDbReaderFactory(required: StructType,
    confEntries: Array[(String, String)], format: String = "graft",
    gcBeforeS: Long = 0L) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatsDbInputPartition]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    if (format == "cassandra")
      new CassandraStatsPartitionReader(p.files, required, conf, gcBeforeS)
    else new StatsDbPartitionReader(p.files, required, conf)
  }
}

/** Reads a batch of REAL-format (Cassandra "nb") Statistics.db files — one
  * row per file, fields per [[CassandraStatsFormat.Schema]]. The
  * `generation` column parses from the descriptor file name
  * (`nb-<gen>-big-Statistics.db`); `droppable_x1000` evaluates the
  * tombstone histogram at the `gcbefore` option's cutoff — exactly
  * `getDroppableTombstonesBefore(NOW − gc_grace)` in the reference
  * (CassandraBackend.java:116). */
final class CassandraStatsPartitionReader(files: Array[(String, String)],
    required: StructType, conf: Configuration, gcBeforeS: Long)
    extends PartitionReader[InternalRow] {

  import CassandraStatsFormat.{File => CFile}

  private var i = -1
  private var current: (Long, CFile) = _

  private def generationOf(id: String): Long = {
    // descriptor "nb-<generation>-big"
    val parts = id.split("-")
    if (parts.length >= 2) parts(1).toLong
    else throw new java.io.IOException(s"not a Cassandra descriptor: $id")
  }

  private val extractors: Array[((Long, CFile)) => Any] =
    required.fieldNames.map {
      case "generation" => (r: (Long, CFile)) => r._1
      case "partitioner" =>
        r => UTF8String.fromString(r._2.validation.partitioner)
      case "bloom_fp_x1e6" =>
        r => math.floor(r._2.validation.bloomFpChance * 1e6).toLong
      case "partition_size_count" => r => r._2.stats.partitionSize.count
      case "partition_size_max" => r => r._2.stats.partitionSize.max
      case "partition_size_mean" => r => r._2.stats.partitionSize.mean
      case "column_count_max" => r => r._2.stats.columnCount.max
      case "column_count_mean" => r => r._2.stats.columnCount.mean
      case "commit_log_segment" => r => r._2.stats.commitLogUpper.segmentId
      case "commit_log_pos" => r => r._2.stats.commitLogUpper.position.toLong
      case "min_timestamp_us" => r => r._2.stats.minTimestampUs
      case "max_timestamp_us" => r => r._2.stats.maxTimestampUs
      case "min_ldt_s" => r => r._2.stats.minLocalDeletionTimeS.toLong
      case "max_ldt_s" => r => r._2.stats.maxLocalDeletionTimeS.toLong
      case "min_ttl_s" => r => r._2.stats.minTtlS.toLong
      case "max_ttl_s" => r => r._2.stats.maxTtlS.toLong
      case "compression_ratio_x1e6" =>
        r => math.floor(r._2.stats.compressionRatio * 1e6).toLong
      case "level" => r => r._2.stats.level.toLong
      case "repaired_at_ms" => r => r._2.stats.repairedAtMs
      case "is_repaired" => r => r._2.stats.repairedAtMs != 0L
      case "min_clustering_components" =>
        r => r._2.stats.minClustering.length.toLong
      case "max_clustering_components" =>
        r => r._2.stats.maxClustering.length.toLong
      case "has_legacy_counter_shards" => r => r._2.stats.hasLegacyCounterShards
      case "total_columns_set" => r => r._2.stats.totalColumnsSet
      case "total_rows" => r => r._2.stats.totalRows
      case "droppable_x1000" =>
        r => math.floor(r._2.stats.tombstones.sum(gcBeforeS.toDouble) * 1000).toLong
      case "is_transient" => r => r._2.stats.isTransient
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def next(): Boolean = {
    i += 1
    if (i >= files.length) return false
    val (file, id) = files(i)
    val hPath = new Path(file)
    val fs = hPath.getFileSystem(conf)
    val len = fs.getFileStatus(hPath).getLen
    if (len > (1L << 24))
      throw new java.io.IOException(s"implausible Statistics.db size $len")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(hPath)
    try in.readFully(0L, bytes) finally in.close()
    current = (generationOf(id), CassandraStatsFormat.parse(bytes))
    true
  }
  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_(current)))
  override def close(): Unit = ()
}

/** Reads a batch of Statistics.db files, one row each; only the columns in
  * `required` are materialized. */
final class StatsDbPartitionReader(files: Array[(String, String)],
    required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private var i = -1
  private var current: (UTF8String, StatsDbFormat.Stats) = _

  private val extractors: Array[((UTF8String, StatsDbFormat.Stats)) => Any] =
    required.fieldNames.map {
      case "sstable_id" => (r: (UTF8String, StatsDbFormat.Stats)) => r._1
      case "keyspace" => r => UTF8String.fromString(r._2.keyspace)
      case "tbl" => r => UTF8String.fromString(r._2.tbl)
      case "partition_count" => r => r._2.partitionCount
      case "uncompressed_length" => r => r._2.uncompressedLength
      case "disk_length" => r => r._2.diskLength
      case "max_partition_size" => r => r._2.maxPartitionSize
      case "avg_partition_size" => r => r._2.avgPartitionSize
      case "cell_count" => r => r._2.cellCount
      case "min_timestamp_us" => r => r._2.minTimestampUs
      case "max_timestamp_us" => r => r._2.maxTimestampUs
      case "level" => r => r._2.level
      case "is_repaired" => r => r._2.isRepaired
      case "repaired_at_ms" => r => r._2.repairedAtMs.map(Long.box).orNull
      case "compaction_strategy" => r => UTF8String.fromString(r._2.compactionStrategy)
      case "file_timestamp_ms" => r => r._2.fileTimestampMs
      case "min_local_deletion_time_s" => r => r._2.minLocalDeletionTimeS
      case "max_local_deletion_time_s" => r => r._2.maxLocalDeletionTimeS
      case "estimated_keys" => r => r._2.estimatedKeys
      case "avg_column_count" => r => r._2.avgColumnCount
      case "max_column_count" => r => r._2.maxColumnCount
      case "droppable_tombstone_count" => r => r._2.droppableTombstoneCount
      case "droppable_ratio_x1000" => r => r._2.droppableRatioX1000
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def next(): Boolean = {
    i += 1
    if (i >= files.length) return false
    val (file, id) = files(i)
    val hPath = new Path(file)
    val fs = hPath.getFileSystem(conf)
    val len = fs.getFileStatus(hPath).getLen
    if (len > (1L << 24))
      throw new java.io.IOException(s"implausible Statistics.db size $len")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(hPath)
    try in.readFully(0L, bytes) finally in.close()
    current = (UTF8String.fromString(id), StatsDbFormat.parse(bytes))
    true
  }
  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_(current)))
  override def close(): Unit = ()
}
