package graft.sources.summarydb

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 over the REAL Summary.db component (`sstable-summary`): one row
  * per summary ENTRY — the downsampled partition sample Cassandra mmaps
  * to bound Index.db binary searches — with the per-file header fields
  * alongside (`min_interval`, `sampling_level`, `size_at_full_sampling`,
  * first/last key). The q76 roundtrip consumes this relation instead of
  * whole-file `binaryFile` blobs, so the component gets the same
  * production scan affordances as the other sidecar sources:
  *
  *  - `generation` equality/IN predicates prune FILES at planning time;
  *  - [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]
  *    prunes files at EXECUTION time when a join realizes the relevant
  *    generation set (the round-10 IndexDb pattern — planInputPartitions
  *    runs after filter(), so pruned files are never opened);
  *  - summaries are tiny (1/128th of the index at real sampling), so
  *    many files batch into one input partition.
  */
class SummaryDbDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "sstable-summary"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SummaryDbDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SummaryDbTable(properties.asScala.toMap)
}

object SummaryDbDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("generation", LongType, nullable = false),
    StructField("min_interval", LongType, nullable = false),
    StructField("sampling_level", LongType, nullable = false),
    StructField("size_at_full_sampling", LongType, nullable = false),
    StructField("entry_index", LongType, nullable = false),
    StructField("key", BinaryType, nullable = false),
    StructField("position", LongType, nullable = false),
    StructField("first_key", BinaryType, nullable = false),
    StructField("last_key", BinaryType, nullable = false)))
}

final class SummaryDbTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"sstable_summary(${properties.getOrElse("path", "")})"
  override def schema(): StructType = SummaryDbDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SummaryDbScanBuilder(options.asScala.toMap)
}

final class SummaryDbScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SummaryDbDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** generation equality/IN prunes files; all filters stay residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("generation", _) => true
      case In("generation", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = SummaryDbScan(
    options.getOrElse("path", throw new IllegalArgumentException(
      "sstable-summary requires a path")),
    required, pushed,
    options.get("filesperpartition").map(_.toInt).getOrElse(512))
}

final case class SummaryDbScan(path: String, required: StructType,
    pushed: Array[Filter], filesPerPartition: Int) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SummaryDbScan path=$path pushed=${pushed.mkString(",")} " +
      (if (runtime.nonEmpty) s"RuntimeFilters=${runtime.mkString(",")} "
       else "") +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("generation"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case EqualTo("generation", _) => true
      case In("generation", _) => true
      case _ => false
    }

  /** Conservative: a name that doesn't parse as a descriptor is KEPT
    * (the reader then fails with a clear message) — pruning must only
    * ever drop files proven irrelevant. */
  private def fileSurvives(gen: Option[Long]): Boolean =
    (pushed ++ runtime).forall {
      case EqualTo("generation", v) =>
        gen.forall(g => SummaryDbScan.asLongOpt(v).forall(_ == g))
      case In("generation", vs) =>
        gen.forall(g => vs.flatMap(SummaryDbScan.asLongOpt).contains(g))
      case _ => true
    }

  private def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sessionHadoopConf())
    val status = fs.getFileStatus(p)
    val files =
      if (status.isDirectory)
        fs.listStatus(p).toSeq.filter(s =>
          s.isFile && s.getPath.getName.endsWith(SummaryDbFormat.Suffix))
      else Seq(status)
    files.map(_.getPath.toString).sorted
      .filter(f => fileSurvives(SummaryDbScan.genOpt(
        new org.apache.hadoop.fs.Path(f).getName)))
      .grouped(math.max(1, filesPerPartition))
      .map(g => SummaryDbInputPartition(g.toArray): InputPartition)
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
    new SummaryDbReaderFactory(required, entries)
  }
}

object SummaryDbScan {
  private[summarydb] def asLongOpt(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** Lenient descriptor parse for PLANNING-time pruning. */
  private[summarydb] def genOpt(name: String): Option[Long] =
    name.stripSuffix(SummaryDbFormat.Suffix)
      .split("-").lift(1).flatMap(_.toLongOption)

  /** "nb-<gen>-big-Summary.db" → gen (strict; the READER's contract). */
  private[summarydb] def generationOf(name: String): Long =
    genOpt(name).getOrElse(throw new java.io.IOException(
      s"not a Cassandra descriptor: $name"))
}

final case class SummaryDbInputPartition(files: Array[String])
    extends InputPartition

final class SummaryDbReaderFactory(required: StructType,
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SummaryDbInputPartition]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    new SummaryDbPartitionReader(p.files, required, conf)
  }
}

final class SummaryDbPartitionReader(files: Array[String],
    required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private var fileIdx = -1
  private var entryIdx = -1
  private var gen = 0L
  private var summary: SummaryDbFormat.Summary = _

  private def advanceFile(): Boolean = {
    fileIdx += 1
    if (fileIdx >= files.length) return false
    val hPath = new org.apache.hadoop.fs.Path(files(fileIdx))
    val fs = hPath.getFileSystem(conf)
    val len = fs.getFileStatus(hPath).getLen
    if (len > (1L << 31))
      throw new java.io.IOException(s"implausible Summary.db size $len")
    val in = fs.open(hPath)
    try summary = SummaryDbFormat.parse(new java.io.DataInputStream(
      new java.io.BufferedInputStream(in, 1 << 16)))
    finally in.close()
    gen = SummaryDbScan.generationOf(hPath.getName)
    entryIdx = -1
    true
  }

  private val extractors: Array[() => Any] =
    required.fieldNames.map {
      case "generation" => () => gen
      case "min_interval" => () => summary.minIndexInterval.toLong
      case "sampling_level" => () => summary.samplingLevel.toLong
      case "size_at_full_sampling" =>
        () => summary.sizeAtFullSampling.toLong
      case "entry_index" => () => entryIdx.toLong
      case "key" => () => summary.entries(entryIdx).key
      case "position" => () => summary.entries(entryIdx).position
      case "first_key" => () => summary.firstKey
      case "last_key" => () => summary.lastKey
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def next(): Boolean = {
    while (true) {
      if (summary != null && entryIdx + 1 < summary.entries.length) {
        entryIdx += 1
        return true
      }
      if (!advanceFile()) return false
    }
    false
  }
  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_()))
  override def close(): Unit = ()
}
