package graft.sources.statsdb

import java.io.{ByteArrayOutputStream, DataOutput, DataOutputStream}

import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}

import graft.sources.indexdb.IndexDbFormat.{readUnsignedVInt, writeUnsignedVInt}

/** The SSTable metadata-file (Statistics.db) on-disk format of this engine —
  * the per-sstable summary the reference's `summary`/`sstables` commands
  * consume without touching any data file (CassandraBackend.java:89-123,
  * filling SSTableMetadata.java:47-84: timestamps, lengths, partition-size
  * stats, level, repairedAt, strategy).
  *
  * Layout mirrors real Statistics.db structurally — a component TOC of
  * (type, offset) pairs followed by the serialized components, so readers
  * locate a component by type without parsing the others (Cassandra's
  * MetadataSerializer contract):
  *
  * ```
  * file       := magic:uint32_be(0x47535441 "GSTA") version:uvint(1)
  *               count:uvint (type:byte offset:uint32_be)*count component*
  * VALIDATION := ks_len:uint16_be ks:utf8 tbl_len:uint16_be tbl:utf8
  *               strat_len:uint16_be strat:utf8          // type 0
  * STATS      := partition_count:uvint uncompressed_length:uvint
  *               disk_length:uvint max_partition_size:uvint
  *               avg_partition_size:uvint cell_count:uvint
  *               min_timestamp_us:uvint max_timestamp_us:uvint
  *               level:uvint flags:byte                  // bit0 repaired
  *               [repaired_at_ms:uvint]                  // iff repaired
  *               file_timestamp_ms:uvint
  *               min_local_deletion_time_s:uvint
  *               max_local_deletion_time_s:uvint
  *               estimated_keys:uvint
  *               avg_column_count:uvint max_column_count:uvint
  *               droppable_tombstone_count:uvint
  *               droppable_ratio_x1000:uvint             // type 1
  * ```
  *
  * Version 2 appended the S2 parity fields (file timestamp, deletion-time
  * bounds, estimated keys, column counts, droppable-tombstone estimate —
  * SSTableMetadataCollector.java:39-57); version-1 files are rejected.
  *
  * Metadata files are O(100 B); parsing operates on the fully-read bytes
  * (exactly how engines treat parquet footers), never streaming.
  */
object StatsDbFormat {

  val Suffix = "-Statistics.db"
  val Magic = 0x47535441
  val Version = 2L
  val TypeValidation = 0
  val TypeStats = 1

  /** Same shape as `Fixtures.sstableMeta`, so the `summary`/`sstables`
    * pipelines run unchanged off raw files. */
  val Schema: StructType = StructType(Seq(
    StructField("sstable_id", StringType, nullable = false),
    StructField("keyspace", StringType, nullable = false),
    StructField("tbl", StringType, nullable = false),
    StructField("partition_count", LongType, nullable = false),
    StructField("uncompressed_length", LongType, nullable = false),
    StructField("disk_length", LongType, nullable = false),
    StructField("max_partition_size", LongType, nullable = false),
    StructField("avg_partition_size", LongType, nullable = false),
    StructField("cell_count", LongType, nullable = false),
    StructField("min_timestamp_us", LongType, nullable = false),
    StructField("max_timestamp_us", LongType, nullable = false),
    StructField("level", IntegerType, nullable = false),
    StructField("is_repaired", BooleanType, nullable = false),
    StructField("repaired_at_ms", LongType, nullable = true),
    StructField("compaction_strategy", StringType, nullable = false),
    StructField("file_timestamp_ms", LongType, nullable = false),
    StructField("min_local_deletion_time_s", LongType, nullable = false),
    StructField("max_local_deletion_time_s", LongType, nullable = false),
    StructField("estimated_keys", LongType, nullable = false),
    StructField("avg_column_count", LongType, nullable = false),
    StructField("max_column_count", LongType, nullable = false),
    StructField("droppable_tombstone_count", LongType, nullable = false),
    StructField("droppable_ratio_x1000", LongType, nullable = false)))

  final case class Stats(
      keyspace: String,
      tbl: String,
      partitionCount: Long,
      uncompressedLength: Long,
      diskLength: Long,
      maxPartitionSize: Long,
      avgPartitionSize: Long,
      cellCount: Long,
      minTimestampUs: Long,
      maxTimestampUs: Long,
      level: Int,
      isRepaired: Boolean,
      repairedAtMs: Option[Long],
      compactionStrategy: String,
      fileTimestampMs: Long,
      minLocalDeletionTimeS: Long,
      maxLocalDeletionTimeS: Long,
      estimatedKeys: Long,
      avgColumnCount: Long,
      maxColumnCount: Long,
      droppableTombstoneCount: Long,
      droppableRatioX1000: Long)

  private def writeUtf(out: DataOutput, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeShort(b.length)
    out.write(b)
  }

  /** Serializes one sstable's metadata (TOC + both components). */
  def write(out: DataOutput, s: Stats): Unit = {
    val validation = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      writeUtf(d, s.keyspace); writeUtf(d, s.tbl)
      writeUtf(d, s.compactionStrategy)
      bos.toByteArray
    }
    val stats = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      writeUnsignedVInt(d, s.partitionCount)
      writeUnsignedVInt(d, s.uncompressedLength)
      writeUnsignedVInt(d, s.diskLength)
      writeUnsignedVInt(d, s.maxPartitionSize)
      writeUnsignedVInt(d, s.avgPartitionSize)
      writeUnsignedVInt(d, s.cellCount)
      writeUnsignedVInt(d, s.minTimestampUs)
      writeUnsignedVInt(d, s.maxTimestampUs)
      writeUnsignedVInt(d, s.level.toLong)
      d.write(if (s.isRepaired) 1 else 0)
      s.repairedAtMs.foreach(writeUnsignedVInt(d, _))
      writeUnsignedVInt(d, s.fileTimestampMs)
      writeUnsignedVInt(d, s.minLocalDeletionTimeS)
      writeUnsignedVInt(d, s.maxLocalDeletionTimeS)
      writeUnsignedVInt(d, s.estimatedKeys)
      writeUnsignedVInt(d, s.avgColumnCount)
      writeUnsignedVInt(d, s.maxColumnCount)
      writeUnsignedVInt(d, s.droppableTombstoneCount)
      writeUnsignedVInt(d, s.droppableRatioX1000)
      bos.toByteArray
    }
    // header size: magic(4) + version-vint + count-vint + 2×(1 + 4)
    val header = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeInt(Magic)
      writeUnsignedVInt(d, Version)
      writeUnsignedVInt(d, 2L)
      bos.toByteArray
    }
    val tocBytes = 2 * 5
    val validationOff = header.length + tocBytes
    val statsOff = validationOff + validation.length
    out.write(header)
    out.write(TypeValidation); out.writeInt(validationOff)
    out.write(TypeStats); out.writeInt(statsOff)
    out.write(validation)
    out.write(stats)
  }

  /** Parses a whole Statistics.db file. Components are located through the
    * TOC (their offsets, not their write order). */
  def parse(bytes: Array[Byte]): Stats = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    if (in.readInt() != Magic)
      throw new java.io.IOException("not a Statistics.db file (bad magic)")
    val version = readUnsignedVInt(in)
    if (version != Version)
      throw new java.io.IOException(s"unsupported Statistics.db version $version")
    val count = readUnsignedVInt(in).toInt
    val toc = Array.fill(count)((in.readUnsignedByte(), in.readInt()))
    def component(tpe: Int): java.io.DataInputStream = {
      val off = toc.collectFirst { case (t, o) if t == tpe => o }
        .getOrElse(throw new java.io.IOException(s"missing component $tpe"))
      if (off < 0 || off >= bytes.length)
        throw new java.io.IOException(s"corrupt TOC offset $off")
      new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, off, bytes.length - off))
    }
    def readUtf(d: java.io.DataInputStream): String = {
      val len = d.readUnsignedShort()
      val b = new Array[Byte](len)
      d.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }
    val v = component(TypeValidation)
    val keyspace = readUtf(v); val tbl = readUtf(v); val strategy = readUtf(v)
    val st = component(TypeStats)
    val partitionCount = readUnsignedVInt(st)
    val uncompressedLength = readUnsignedVInt(st)
    val diskLength = readUnsignedVInt(st)
    val maxPartitionSize = readUnsignedVInt(st)
    val avgPartitionSize = readUnsignedVInt(st)
    val cellCount = readUnsignedVInt(st)
    val minTs = readUnsignedVInt(st)
    val maxTs = readUnsignedVInt(st)
    val level = readUnsignedVInt(st).toInt
    val repaired = st.readUnsignedByte() != 0
    val repairedAt = if (repaired) Some(readUnsignedVInt(st)) else None
    val fileTs = readUnsignedVInt(st)
    val minLdt = readUnsignedVInt(st)
    val maxLdt = readUnsignedVInt(st)
    val estKeys = readUnsignedVInt(st)
    val avgCols = readUnsignedVInt(st)
    val maxCols = readUnsignedVInt(st)
    val droppable = readUnsignedVInt(st)
    val droppableRatio = readUnsignedVInt(st)
    Stats(keyspace, tbl, partitionCount, uncompressedLength, diskLength,
      maxPartitionSize, avgPartitionSize, cellCount, minTs, maxTs, level,
      repaired, repairedAt, strategy, fileTs, minLdt, maxLdt, estKeys,
      avgCols, maxCols, droppable, droppableRatio)
  }
}
