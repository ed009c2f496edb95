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
    StatsDbFormat.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsDbTable(properties.asScala.toMap)
}

final class StatsDbTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"sstable_stats(${properties.getOrElse("path", "")})"
  override def schema(): StructType = StatsDbFormat.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StatsDbScanBuilder(options.asScala.toMap)
}

final class StatsDbScanBuilder(options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = StatsDbFormat.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** sstable_id equality/IN filters prune files; all filters stay residual
    * (row-level re-check on pruned input is free). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("sstable_id", _) => true
      case In("sstable_id", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = StatsDbScan(
    options.getOrElse("path",
      throw new IllegalArgumentException("sstable-stats requires a path")),
    required, pushed,
    // lower-case key: options come from a CaseInsensitiveStringMap
    options.get("filesperpartition").map(_.toInt).getOrElse(512))
}

final case class StatsDbScan(path: String, required: StructType,
    pushed: Array[Filter], filesPerPartition: Int) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StatsDbScan path=$path pushed=${pushed.mkString(",")} " +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  private def sstableIdOf(fileName: String): String =
    fileName.stripSuffix(StatsDbFormat.Suffix)

  private def fileSurvives(id: String): Boolean =
    pushed.forall {
      case EqualTo("sstable_id", v) => id == v
      case In("sstable_id", vs) => vs.contains(id)
      case _ => true
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
    new StatsDbReaderFactory(required, entries)
  }
}

final case class StatsDbInputPartition(files: Array[(String, String)])
    extends InputPartition

final class StatsDbReaderFactory(required: StructType,
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StatsDbInputPartition]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    new StatsDbPartitionReader(p.files, required, conf)
  }
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
