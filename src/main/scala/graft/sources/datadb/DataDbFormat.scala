package graft.sources.datadb

import java.io.{DataInput, DataInputStream, DataOutput, EOFException, InputStream}

import org.apache.spark.sql.types.{BinaryType, BooleanType, LongType, StringType, StructField, StructType}

import graft.sources.indexdb.IndexDbFormat.{readUnsignedVInt, readVInt, writeUnsignedVInt, writeVInt}

/** The SSTable data-file (Data.db) on-disk format of this engine — the
  * cell-event granularity the reference's `cfstats`/`purge` paths consume
  * (cassandra/DataReader.java:46-123): per partition, a stream of
  * row-cells and range-tombstone markers, each carrying liveness flags,
  * a write timestamp (µs), a TTL (s, -1 = none) and a local deletion
  * time (s, Integer.MAX_VALUE = live).
  *
  * Layout (all vints are Cassandra unsigned vints, shared with
  * [[graft.sources.indexdb.IndexDbFormat]]):
  *
  * ```
  * file      := partition*
  * partition := key_len:uint16_be key:bytes[key_len] event* end
  * event     := kind:byte(1 + KindCode: 1=cell, 2=range-tombstone-marker,
  *                        3=static-cell, 4=row-liveness, 5=row-deletion,
  *                        6=complex-column-deletion)
  *              clustering:uvint      // StaticClustering(-1) wraps to the
  *                                    // 9-byte encoding, bit-exactly
  *              col_len:uint16_be col:utf8[col_len]
  *              flags:byte            // bit0 tombstone, bit1 expiring,
  *                                    // bit2 counter,   bit3 live
  *              timestamp_us:svint    // zigzag: write timestamps are
  *                                    // arbitrary SIGNED longs in Cassandra
  *              ttl_plus1:uvint       // ttl_s + 1, so NO_TTL(-1) encodes 0
  *              local_deletion_time_s:uvint  // seconds since epoch:
  *                                    // non-negative by domain (sentinel
  *                                    // Integer.MAX_VALUE = live)
  *              size_bytes:uvint      // non-negative by domain
  * end       := 0x00                  // end-of-partition marker
  * ```
  *
  * The end-of-partition marker (not an up-front event count) mirrors the
  * reference's streaming contract — DataReader pulls unfiltereds off an
  * iterator until exhausted (DataReader.java:66-71), never knowing the
  * count ahead; a reader can likewise stream one partition without
  * buffering it. Real Cassandra Data.db files additionally carry
  * per-partition deletion headers and serialization-header varint deltas;
  * this format keeps the event-level semantics (the part the reference's
  * statistics consume) and drops the storage-engine framing.
  */
object DataDbFormat {

  val Suffix = "-Data.db"

  val KindCell = "CELL"
  val KindMarker = "RANGE_TOMBSTONE_MARKER"
  val KindStaticCell = "STATIC_CELL"
  val KindRowLiveness = "ROW_LIVENESS"
  val KindRowDeletion = "ROW_DELETION"
  val KindComplexDeletion = "COMPLEX_DELETION"
  val KindPartitionDeletion = "PARTITION_DELETION"

  /** Event kind codes ([[Event.kindCode]]); array order defines the wire
    * byte (1 + code) in the engine codec and the `kind` string surfaced
    * by the DSv2 readers. Codes 2..6 are the metadata the real format
    * carries beyond plain cells: static-row cells, primary-key liveness,
    * row deletions, complex-column deletions and partition-level
    * deletions (the DeletionTime every partition header frames). */
  val KindCodeCell = 0
  val KindCodeMarker = 1
  val KindCodeStaticCell = 2
  val KindCodeRowLiveness = 3
  val KindCodeRowDeletion = 4
  val KindCodeComplexDeletion = 5
  val KindCodePartitionDeletion = 6
  val KindStrings: Array[String] = Array(KindCell, KindMarker,
    KindStaticCell, KindRowLiveness, KindRowDeletion, KindComplexDeletion,
    KindPartitionDeletion)

  /** Static rows sort before every clustered row; the relational surface
    * (LongType clustering) uses this sentinel for them and for row-level
    * events' "no single cell column" position. */
  val StaticClustering = -1L

  /** Partition-level events sort before even the static row. */
  val PartitionClustering = -2L

  val FlagTombstone = 1
  val FlagExpiring = 2
  val FlagCounter = 4
  val FlagLive = 8

  /** One row per cell / range-tombstone-marker event — the same shape as
    * the `cells` fixture (FIXTURES.md), so the relational cfstats/purge
    * pipelines run unchanged off raw files. */
  val Schema: StructType = StructType(Seq(
    StructField("sstable_id", StringType, nullable = false),
    StructField("key", BinaryType, nullable = false),
    StructField("clustering", LongType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("timestamp_us", LongType, nullable = false),
    StructField("ttl_s", LongType, nullable = false),
    StructField("local_deletion_time_s", LongType, nullable = false),
    StructField("is_tombstone", BooleanType, nullable = false),
    StructField("is_expiring", BooleanType, nullable = false),
    StructField("is_counter", BooleanType, nullable = false),
    StructField("is_live", BooleanType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    // stored cell VALUE bytes (round 10): populated ONLY when the column
    // is actually requested AND the codec stores values
    // (format=cassandra); null for valueless events and the engine
    // format (which stores sizes, not bytes). A pruned-away `value`
    // never causes the parser to retain bytes.
    StructField("value", BinaryType, nullable = true)))

  final case class Event(
      key: Array[Byte],
      clustering: Long,
      columnNameBytes: Array[Byte],
      kindCode: Int,
      flags: Int,
      timestampUs: Long,
      ttlS: Long,
      localDeletionTimeS: Long,
      sizeBytes: Long,
      // stored value bytes — retained only when the scan requests the
      // `value` column (format=cassandra); null otherwise
      value: Array[Byte] = null) {
    /** Raw UTF-8 bytes are the stored form: the DSv2 reader hands them to
      * UTF8String.fromBytes without a decode/re-encode round-trip, and a
      * pruned column_name never pays for a String at all. */
    def columnName: String =
      new String(columnNameBytes, java.nio.charset.StandardCharsets.UTF_8)
    def isMarker: Boolean = kindCode == KindCodeMarker
    def isTombstone: Boolean = (flags & FlagTombstone) != 0
    def isExpiring: Boolean = (flags & FlagExpiring) != 0
    def isCounter: Boolean = (flags & FlagCounter) != 0
    def isLive: Boolean = (flags & FlagLive) != 0
  }

  def flagsOf(tombstone: Boolean, expiring: Boolean, counter: Boolean,
      live: Boolean): Int =
    (if (tombstone) FlagTombstone else 0) |
      (if (expiring) FlagExpiring else 0) |
      (if (counter) FlagCounter else 0) |
      (if (live) FlagLive else 0)

  def writePartitionHeader(out: DataOutput, key: Array[Byte]): Unit = {
    out.writeShort(key.length)
    out.write(key)
  }

  def writeEvent(out: DataOutput, e: Event): Unit = {
    out.write(1 + e.kindCode)
    writeUnsignedVInt(out, e.clustering)
    val col = e.columnNameBytes
    out.writeShort(col.length)
    out.write(col)
    out.write(e.flags)
    writeVInt(out, e.timestampUs)
    writeUnsignedVInt(out, e.ttlS + 1L)
    writeUnsignedVInt(out, e.localDeletionTimeS)
    writeUnsignedVInt(out, e.sizeBytes)
  }

  def writePartitionEnd(out: DataOutput): Unit = out.write(0)

  /** Streaming event iterator over a raw Data.db stream. One partition is
    * never buffered — events carry their partition key and flow out as
    * parsed, the reference's one-record-at-a-time contract
    * (SSTableReader.java:6-27).
    *
    * `stopAtBoundary` is consulted before each partition header: when it
    * returns true the iterator ends as if at EOF. Split readers pass a
    * byte-position check so a [start, end) range reads exactly the
    * partition blocks beginning inside it (ends are always block-aligned
    * because split cuts come from the partition index). */
  def events(stream: InputStream,
      stopAtBoundary: () => Boolean = () => false): Iterator[Event] =
    new Iterator[Event] {
    private val in = new DataInputStream(stream)
    private var currentKey: Array[Byte] = _
    private var nextEvent: Event = _
    private var done = false

    private def readKeyHeader(): Boolean = {
      if (stopAtBoundary()) { done = true; in.close(); return false }
      val b0 = in.read()
      if (b0 < 0) { done = true; in.close(); return false }
      val b1 = in.read()
      if (b1 < 0) throw new EOFException("truncated partition-key length")
      val keyLen = (b0 << 8) | b1
      val key = new Array[Byte](keyLen)
      in.readFully(key)
      currentKey = key
      true
    }

    private def advance(): Unit = {
      while (nextEvent == null && !done) {
        if (currentKey == null) {
          if (!readKeyHeader()) return
        }
        val kind = in.read()
        if (kind < 0) throw new EOFException("truncated partition (no end marker)")
        if (kind == 0) { currentKey = null } // end of partition
        else {
          if (kind < 1 || kind > KindStrings.length)
            throw new java.io.IOException(s"corrupt event kind $kind")
          val clustering = readUnsignedVInt(in)
          val colLen = in.readUnsignedShort()
          val colBytes = new Array[Byte](colLen)
          in.readFully(colBytes)
          val flags = in.readUnsignedByte()
          val ts = readVInt(in)
          val ttl = readUnsignedVInt(in) - 1L
          val ldt = readUnsignedVInt(in)
          val size = readUnsignedVInt(in)
          nextEvent = Event(currentKey, clustering, colBytes,
            kindCode = kind - 1, flags = flags, timestampUs = ts, ttlS = ttl,
            localDeletionTimeS = ldt, sizeBytes = size)
        }
      }
    }

    override def hasNext: Boolean = {
      if (!done && nextEvent == null) advance()
      nextEvent != null
    }
    override def next(): Event = {
      if (!hasNext) throw new NoSuchElementException
      val e = nextEvent; nextEvent = null; e
    }
  }
}
