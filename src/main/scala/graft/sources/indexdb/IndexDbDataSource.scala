package graft.sources.indexdb

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for raw SSTable partition-index files:
  * `spark.read.format("sstable-index").load(dirOrFile)` yields
  * `(sstable_id string, key binary, position long)` — one row per index
  * entry, one input partition per Index.db file (the reference's reader
  * granularity, cassandra/IndexReader.java). This is the "real SSTable
  * source" milestone of SURVEY §7 M6(a): the `pstats` pipeline can run
  * against actual Cassandra index files instead of derived fixtures.
  * `option("format", "bti")` reads trie-indexed Partitions.db files
  * (Cassandra 5's bti family) into the same relation via the full-scan
  * trie walk ([[graft.sources.bti.BtiTrieFormat]]).
  *
  * Scale behavior:
  *  - column pruning reaches the parser (unneeded fields are not even
  *    materialized into rows);
  *  - `sstable_id` equality/IN predicates prune whole FILES before any byte
  *    is read — the reference's `-f` filter (F1) pushed into the source;
  *  - files split the work: 1000 executors reading 100k sstables parallelize
  *    by file with zero coordination, and no shuffle is introduced.
  */
class IndexDbDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "sstable-index"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IndexDbFormat.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IndexDbTable(properties.asScala.toMap)
}

final class IndexDbTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"sstable_index(${properties.getOrElse("path", "")})"
  override def schema(): StructType = IndexDbFormat.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IndexDbScanBuilder(options.asScala.toMap)
}

final class IndexDbScanBuilder(options: Map[String, String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var required: StructType = IndexDbFormat.Schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedCounts: Int = 0
  private var limit: Int = -1

  /** LIMIT pushdown: each file's reader stops after `n` entries — a
    * `LIMIT n` probe over a 100k-file directory reads at most n entries
    * PER FILE instead of every byte of every index (Spark still takes
    * the global first n; the scan's guarantee is per-partition, which is
    * all the API asks). Partial by contract (isPartiallyPushed). */
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed: Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Records sstable_id equality/IN filters for file pruning. All filters
    * are returned as residual: file pruning is a strict superset guarantee,
    * and Spark re-checking row-level is free on pruned input. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("sstable_id", _) => true
      case In("sstable_id", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** AGGREGATE pushdown: `GROUP BY sstable_id` + COUNT(*) never crosses
    * the scan boundary as rows — the scan answers with one row per file
    * from a pure skip-walk ([[IndexDbFormat.countEntries]]): no key
    * copies, no entry rows, no exchange into the aggregate. sstable_id is
    * the file identity, so the group is exactly one input partition and
    * the pushdown is COMPLETE (no Spark-side final aggregation at all).
    * Spark only attempts this when no post-scan filters remain, and this
    * builder additionally refuses when any filter was recorded or the
    * format is bti (whose trie layout has no linear entry stream). */
  private def countPushable(agg: Aggregation): Boolean =
    options.getOrElse("format", "big") == "big" &&
      pushed.isEmpty &&
      agg.groupByExpressions.length == 1 &&
      (agg.groupByExpressions()(0) match {
        case r: NamedReference => r.fieldNames().sameElements(
          Array("sstable_id"))
        case _ => false
      }) &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(_.isInstanceOf[CountStar])

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    countPushable(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (countPushable(agg)) {
      pushedCounts = agg.aggregateExpressions().length; true
    } else false

  private def path: String = options.getOrElse("path",
    throw new IllegalArgumentException("sstable-index requires a path"))

  override def build(): Scan =
    if (pushedCounts > 0) IndexDbCountScan(path, pushedCounts)
    else IndexDbScan(path, required, pushed,
      // format=bti reads trie-indexed Partitions.db files (full-scan path)
      // through the same relation; default is big-format Index.db
      options.getOrElse("format", "big"), limit)
}

/** The pushed-COUNT scan: one input partition per Index.db file, one
  * output row per file — (sstable_id, count, ...) in the pushed
  * aggregation's column order. */
final case class IndexDbCountScan(path: String, nCounts: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(
    org.apache.spark.sql.types.StructField("sstable_id", org.apache.spark.sql.types.StringType,
      nullable = false) +:
      (0 until nCounts).map(i =>
        org.apache.spark.sql.types.StructField(s"count_$i", org.apache.spark.sql.types.LongType,
          nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"IndexDbCountScan path=$path PushedAggregates=[COUNT(*) x $nCounts] " +
      "GroupBy=[sstable_id]"

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
        fs.listStatus(p).toSeq.filter(s =>
          s.isFile && s.getPath.getName.endsWith(IndexDbFormat.Suffix))
      else Seq(status)
    files
      .map(s => (s.getPath.toString,
        s.getPath.getName.stripSuffix(IndexDbFormat.Suffix)))
      .sortBy(_._2)
      .map { case (f, id) => IndexDbInputPartition(f, id): InputPartition }
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
    new IndexDbCountReaderFactory(entries, nCounts)
  }
}

final class IndexDbCountReaderFactory(confEntries: Array[(String, String)],
    nCounts: Int) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IndexDbInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (emitted) false
        else {
          val c = new Configuration(false)
          confEntries.foreach { case (k, v) => c.set(k, v) }
          val hPath = new Path(p.file)
          val in = hPath.getFileSystem(c).open(hPath)
          val n = try IndexDbFormat.countEntries(in) finally in.close()
          row = InternalRow.fromSeq(
            org.apache.spark.unsafe.types.UTF8String.fromString(p.sstableId)
              +: Seq.fill(nCounts)(n))
          emitted = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

final case class IndexDbScan(path: String, required: StructType,
    pushed: Array[Filter], format: String = "big", limit: Int = -1)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"IndexDbScan path=$path format=$format pushed=${pushed.mkString(",")} " +
      (if (limit >= 0) s"PushedLimit=$limit " else "") +
      (if (runtime.nonEmpty) s"RuntimeFilters=${runtime.mkString(",")} "
       else "") +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  /** RUNTIME file pruning (the DSv2 dynamic-pruning hook): when this scan
    * sits under a join whose other side produces the relevant sstable_ids
    * (a dim of flagged sstables, a pstats `-f` list computed at runtime),
    * Spark hands the realized id set here at EXECUTION time and only the
    * surviving files are ever opened — planInputPartitions runs after
    * filter(), so pruning happens before a single byte is read. Same
    * superset-guarantee contract as the static pushFilters path. */
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("sstable_id"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case EqualTo("sstable_id", _) => true
      case In("sstable_id", _) => true
      case _ => false
    }

  private def suffix: String =
    if (format == "bti") graft.sources.bti.BtiTrieFormat.Suffix
    else IndexDbFormat.Suffix

  private def sstableIdOf(fileName: String): String =
    fileName.stripSuffix(suffix)

  private def fileSurvives(id: String): Boolean =
    (pushed ++ runtime).forall {
      case EqualTo("sstable_id", v) => id == v
      case In("sstable_id", vs) => vs.contains(id)
      case _ => true
    }

  /** The active session's Hadoop conf (spark.hadoop.*, fs.* credentials,
    * nameservices) — a blank `new Configuration()` would break any
    * non-local filesystem deployment. */
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
          .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      else Seq(status)
    files
      .map(s => (s.getPath.toString, sstableIdOf(s.getPath.getName)))
      .filter { case (_, id) => fileSurvives(id) }
      .sortBy(_._2)
      .map { case (file, id) => IndexDbInputPartition(file, id): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session's Hadoop conf to executors as plain entries (the
    // Configuration class itself is not Java-serializable)
    val conf = sessionHadoopConf()
    val entries = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new IndexDbReaderFactory(required, entries, format, limit)
  }

  /** Streaming form (cf. DataDbMicroBatchStream): each micro-batch reads
    * the Index.db files that appeared since the committed offset — a live
    * pstats over arriving sstables. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new IndexDbMicroBatchStream(path, required, {
      val conf = sessionHadoopConf()
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    })
}

final case class IndexDbInputPartition(file: String, sstableId: String)
    extends InputPartition

final class IndexDbReaderFactory(required: StructType,
    confEntries: Array[(String, String)], format: String = "big",
    limit: Int = -1) extends PartitionReaderFactory {
  private def conf(): Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IndexDbInputPartition]
    new IndexDbPartitionReader(p.file, p.sstableId, required, conf(),
      format, limit)
  }
  /** Columnar path (cf. DataDbReaderFactory): entries fill flat vectors,
    * no per-entry row allocation. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[IndexDbInputPartition]
    new IndexDbColumnarReader(p.file, p.sstableId, required, conf(),
      format, limit)
  }
}

/** Per-format entries iterator over one open index file. bti reads the
  * whole file (a partition index is small relative to its Data.db and the
  * trie walk needs random access to backward pointers); big streams
  * entry-at-a-time. */
private object IndexEntries {
  def over(stream: org.apache.hadoop.fs.FSDataInputStream, file: String,
      conf: Configuration, format: String): Iterator[IndexDbFormat.Entry] =
    if (format == "bti") {
      import graft.sources.bti.{BtiRowsFormat, BtiTrieFormat}
      val hPath = new Path(file)
      val fs = hPath.getFileSystem(conf)
      val len = fs.getFileStatus(hPath).getLen
      if (len > Int.MaxValue)
        throw new java.io.IOException(s"bti Partitions.db too large: $len")
      val buf = new Array[Byte](len.toInt)
      stream.readFully(0L, buf)
      // negative positions are ~entryOffset references into the sibling
      // Rows.db (large-partition row indexes); resolve them to the entry's
      // Data.db position so the relation stays format-invisible. The
      // sibling loads lazily, once, only when a reference appears.
      lazy val rows: Array[Byte] = {
        val rp = new Path(file.stripSuffix(BtiTrieFormat.Suffix) +
          BtiRowsFormat.Suffix)
        val rLen = fs.getFileStatus(rp).getLen
        if (rLen > Int.MaxValue)
          throw new java.io.IOException(s"bti Rows.db too large: $rLen")
        val rBuf = new Array[Byte](rLen.toInt)
        val rs = fs.open(rp)
        try rs.readFully(0L, rBuf) finally rs.close()
        rBuf
      }
      BtiTrieFormat.fullScan(buf).map { case (k, p) =>
        val pos = if (p >= 0) p else BtiRowsFormat.readEntry(rows, ~p).dataPos
        IndexDbFormat.Entry(k, pos)
      }
    } else
      IndexDbFormat.entries(
        new graft.sources.CountingBufferedInput(stream, 1 << 18))
}

/** Vectorized reader over one Index.db file (cf. DataDbColumnarReader). */
final class IndexDbColumnarReader(file: String, sstableId: String,
    required: StructType, conf: Configuration, format: String = "big",
    limit: Int = -1)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val BatchRows = 4096
  private val hPath = new Path(file)
  private val stream = hPath.getFileSystem(conf).open(hPath)
  // pushed LIMIT: stop the walk after `limit` entries per file
  private val entries = {
    val it = IndexEntries.over(stream, file, conf, format)
    if (limit >= 0) it.take(limit) else it
  }
  private val vectors = OnHeapColumnVector.allocateColumns(BatchRows, required)
  private val batch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector).toArray)
  private val idBytes =
    sstableId.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val fillers: Array[(IndexDbFormat.Entry, Int) => Unit] =
    required.fieldNames.zipWithIndex.map { case (name, i) =>
      val v = vectors(i)
      name match {
        case "sstable_id" =>
          (_: IndexDbFormat.Entry, r: Int) => { v.putByteArray(r, idBytes); () }
        case "key" =>
          (e: IndexDbFormat.Entry, r: Int) => { v.putByteArray(r, e.key); () }
        case "position" =>
          (e: IndexDbFormat.Entry, r: Int) => v.putLong(r, e.position)
        case other =>
          throw new IllegalArgumentException(s"unknown column $other")
      }
    }

  override def next(): Boolean = {
    if (!entries.hasNext) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < BatchRows && entries.hasNext) {
      val e = entries.next()
      var i = 0
      while (i < fillers.length) { fillers(i)(e, n); i += 1 }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = {
    batch.close()
    stream.close()
  }
}

/** Streaming reader over one Index.db file; only the columns in `required`
  * are materialized. */
final class IndexDbPartitionReader(file: String, sstableId: String,
    required: StructType, conf: Configuration, format: String = "big",
    limit: Int = -1)
    extends PartitionReader[InternalRow] {

  private val hPath = new Path(file)
  private val stream = hPath.getFileSystem(conf).open(hPath)
  // big: the vint parser reads byte-at-a-time, so buffer the FS stream;
  // a pushed LIMIT stops the walk after `limit` entries per file
  private val entries = {
    val it = IndexEntries.over(stream, file, conf, format)
    if (limit >= 0) it.take(limit) else it
  }
  private var current: IndexDbFormat.Entry = _
  private val id = UTF8String.fromString(sstableId)
  // projection baked once: required-field ordinal -> value extractor
  private val extractors: Array[IndexDbFormat.Entry => Any] =
    required.fieldNames.map {
      case "sstable_id" => (_: IndexDbFormat.Entry) => id
      case "key" => (e: IndexDbFormat.Entry) => e.key
      case "position" => (e: IndexDbFormat.Entry) => e.position
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def next(): Boolean = {
    if (entries.hasNext) { current = entries.next(); true } else false
  }
  override def get(): InternalRow =
    new GenericInternalRow(extractors.map(_(current)))
  override def close(): Unit = stream.close()
}
