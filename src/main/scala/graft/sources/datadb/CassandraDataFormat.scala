package graft.sources.datadb

import java.io.{ByteArrayOutputStream, DataInput, DataInputStream, DataOutput, DataOutputStream, EOFException, InputStream}

import graft.sources.indexdb.IndexDbFormat.{readUnsignedVInt, readVInt, writeUnsignedVInt, writeVInt}

/** The REAL Cassandra big-format ("nb") Data.db row codec — the second
  * real-on-disk-format beachhead after Statistics.db
  * (sources/statsdb/CassandraStatsFormat): partitions, rows, cells and
  * range-tombstone markers in the post-3.0 `UnfilteredSerializer` layout,
  * with every timestamp/TTL/deletion-time delta-encoded against the
  * `SerializationHeader`'s `EncodingStats` minima exactly as Cassandra
  * writes them. The reference reads these files through the embedded
  * Cassandra library (cassandra/DataReader.java:46-123); this module reads
  * them directly, feeding the same cell-event relation
  * ([[DataDbFormat.Schema]]) the engine's cfstats/purge pipelines consume.
  *
  * Everything mirrors the PUBLIC Apache Cassandra source:
  *
  *  - Partition framing (`ColumnIndex`/big-format writer): short-length
  *    partition key, then `DeletionTime.serializer` (localDeletionTime int,
  *    markedForDeleteAt long — LIVE = (Int.MaxValue, Long.MinValue)), then
  *    unfiltereds until a flags byte with END_OF_PARTITION (0x01).
  *  - Row (`UnfilteredSerializer.serialize`): flags byte (+ extended flags
  *    byte when EXTENSION_FLAG), clustering block, row-body size +
  *    previous-unfiltered size (unsigned vints, present because
  *    isForSSTable), then optional primary-key liveness
  *    (timestamp[, ttl, localExpiration]), optional row deletion, the
  *    column subset (unless HAS_ALL_COLUMNS), and each column's cell data.
  *  - Clustering blocks (`ClusteringPrefix.serializer`): one unsigned-vint
  *    header word per 32 values — bit 2i = value i empty, bit 2i+1 =
  *    value i null — followed by the non-null non-empty values, each raw
  *    (fixed-length types) or vint-length-prefixed (variable).
  *  - Cells (`Cell.serializer`): flags (IS_DELETED 0x01, IS_EXPIRING 0x02,
  *    HAS_EMPTY_VALUE 0x04, USE_ROW_TIMESTAMP 0x08, USE_ROW_TTL 0x10),
  *    delta timestamp, delta localDeletionTime (deleted/expiring), delta
  *    TTL (expiring), cell path (complex columns), value.
  *  - Markers: flags = IS_MARKER (0x02), bound kind ordinal byte, bound
  *    size short, clustering block, body/prev sizes, then one DeletionTime
  *    (bounds) or two (boundaries), delta-encoded.
  *  - `SerializationHeader.serializer` (the HEADER component of
  *    Statistics.db): EncodingStats (unsigned-vint deltas from the
  *    2015-09-22 epochs), key type, clustering types, static + regular
  *    columns (vint-length name bytes + vint-length type name each).
  *
  * Boundaries, stated honestly (same class as CassandraStatsFormat's):
  * written from the published serializer source with no live Cassandra in
  * this sandbox to cross-write fixtures; the relational surface requires
  * a single `LongType` clustering column (arbitrary clustering parses at
  * the codec level). Since round 9 the row-level metadata — static rows,
  * primary-key liveness, row deletions, complex-column deletions,
  * partition deletions — is SURFACED as typed events (q110/q121/q129/
  * q164), not just parsed for stream integrity.
  */
object CassandraDataFormat {

  // UnfilteredSerializer row flags
  val EndOfPartition = 0x01
  val IsMarker = 0x02
  val HasTimestamp = 0x04
  val HasTtl = 0x08
  val HasDeletion = 0x10
  val HasAllColumns = 0x20
  val HasComplexDeletion = 0x40
  val ExtensionFlag = 0x80
  /** extended-flags bit */
  val IsStatic = 0x01

  // Cell.serializer flags
  val CellIsDeleted = 0x01
  val CellIsExpiring = 0x02
  val CellHasEmptyValue = 0x04
  val CellUseRowTimestamp = 0x08
  val CellUseRowTtl = 0x10

  // EncodingStats epochs: 2015-09-22 00:00 GMT in µs / s; TTL epoch 0.
  val TimestampEpochUs = 1442880000000000L
  val DeletionTimeEpochS = 1442880000L
  /** Cassandra's live-cell localDeletionTime sentinel (Int.MaxValue) — the
    * same sentinel the fixture relation uses. */
  val NoDeletionTimeS = 2147483647L
  /** The engine's NO_TTL sentinel on the relational surface (the reference
    * renders TTL -1 as absent; Cassandra simply omits the field). */
  val NoTtlS = -1L

  // ClusteringPrefix.Kind ordinals
  val KindExclEndBound = 0
  val KindInclStartBound = 1
  val KindExclEndInclStartBoundary = 2
  val KindStaticClustering = 3
  val KindClustering = 4
  val KindInclEndExclStartBoundary = 5
  val KindInclEndBound = 6
  val KindExclStartBound = 7

  val Suffix: String = DataDbFormat.Suffix
  val StatsSuffix = "-Statistics.db"

  // ------------------------------------------------------------- marshal

  /** Minimal registry of `org.apache.cassandra.db.marshal` type names: the
    * value serialization is raw bytes for fixed-length types, unsigned-vint
    * length + bytes for variable-length ones (`AbstractType.writeValue`). */
  object Marshal {
    val Prefix = "org.apache.cassandra.db.marshal."

    /** Fixed value length in bytes, or -1 for variable-length types. */
    def fixedLen(typeName: String): Int = strip(typeName) match {
      case "LongType" | "TimestampType" | "DoubleType" => 8
      case "Int32Type" | "FloatType" => 4
      case "UUIDType" | "TimeUUIDType" | "LexicalUUIDType" => 16
      case "BooleanType" | "ByteType" => 1
      case "ShortType" => 2
      case "EmptyType" => 0
      case _ => -1 // BytesType, UTF8Type, AsciiType, IntegerType, …
    }

    def strip(typeName: String): String =
      if (typeName.startsWith(Prefix)) typeName.substring(Prefix.length)
      else typeName

    /** Multi-cell collections: their rows hold one cell PER ELEMENT, each
      * with a cell path (`AbstractType.isMultiCell`). */
    def isComplex(typeName: String): Boolean = {
      val s = strip(typeName)
      s.startsWith("MapType(") || s.startsWith("SetType(") ||
        s.startsWith("ListType(")
    }

    def isCounter(typeName: String): Boolean =
      strip(typeName) == "CounterColumnType"

    /** The type of a complex column's cell VALUES: a map cell's value is
      * the map value (its key is the path), a list cell's value is the
      * element, a set cell's value is empty (the element is the path). */
    def complexValueType(typeName: String): Option[String] = {
      val s = strip(typeName)
      val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      if (s.startsWith("MapType(")) Some(inner.substring(topLevelComma(inner) + 1).trim)
      else if (s.startsWith("ListType(")) Some(inner.trim)
      else None // SetType
    }

    /** Index of the first comma not nested inside parentheses. */
    private def topLevelComma(s: String): Int = {
      var depth = 0
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => return i
          case _ =>
        }
        i += 1
      }
      -1
    }
  }

  // -------------------------------------------------- serialization header

  final case class ColumnSpec(nameBytes: Array[Byte], typeName: String) {
    def name: String =
      new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8)
    def isComplex: Boolean = Marshal.isComplex(typeName)
    def isCounter: Boolean = Marshal.isCounter(typeName)
    /** Fixed length of this column's cell values (-1 = variable). */
    def valueFixedLen: Int =
      if (isComplex)
        Marshal.complexValueType(typeName).map(Marshal.fixedLen).getOrElse(0)
      else Marshal.fixedLen(typeName)
    /** Set cells carry NO value at all (the element is the path). */
    def valueAbsent: Boolean =
      isComplex && Marshal.complexValueType(typeName).isEmpty
  }

  /** The parsed HEADER component: everything the row codec needs. */
  final case class SerializationHeaderInfo(
      minTimestampUs: Long,
      minLocalDeletionTimeS: Long,
      minTtlS: Long,
      keyType: String,
      clusteringTypes: Seq[String],
      staticColumns: Seq[ColumnSpec],
      regularColumns: Seq[ColumnSpec])

  private def writeVintBytes(out: DataOutput, b: Array[Byte]): Unit = {
    writeUnsignedVInt(out, b.length.toLong)
    out.write(b)
  }

  private def writeVintString(out: DataOutput, s: String): Unit =
    writeVintBytes(out, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def readVintBytes(in: DataInput): Array[Byte] = {
    val len = readUnsignedVInt(in)
    if (len < 0 || len > (1 << 20))
      throw new java.io.IOException(s"implausible vint-length $len")
    val b = new Array[Byte](len.toInt)
    in.readFully(b)
    b
  }

  private def readVintString(in: DataInput): String =
    new String(readVintBytes(in), java.nio.charset.StandardCharsets.UTF_8)

  /** `SerializationHeader.serializer.serialize` — the HEADER component
    * bytes inside Statistics.db. */
  def serializeHeader(h: SerializationHeaderInfo): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    // EncodingStats: unsigned-vint deltas from the fixed epochs (negative
    // deltas wrap to 9-byte encodings, bit-exactly, as in Cassandra)
    writeUnsignedVInt(d, h.minTimestampUs - TimestampEpochUs)
    writeUnsignedVInt(d, h.minLocalDeletionTimeS - DeletionTimeEpochS)
    writeUnsignedVInt(d, h.minTtlS)
    writeVintString(d, h.keyType)
    writeUnsignedVInt(d, h.clusteringTypes.length.toLong)
    h.clusteringTypes.foreach(writeVintString(d, _))
    def writeColumns(cols: Seq[ColumnSpec]): Unit = {
      writeUnsignedVInt(d, cols.length.toLong)
      cols.foreach { c =>
        writeVintBytes(d, c.nameBytes)
        writeVintString(d, c.typeName)
      }
    }
    writeColumns(h.staticColumns)
    writeColumns(h.regularColumns)
    bos.toByteArray
  }

  def parseHeader(bytes: Array[Byte]): SerializationHeaderInfo = {
    val d = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val minTs = readUnsignedVInt(d) + TimestampEpochUs
    val minLdt = readUnsignedVInt(d) + DeletionTimeEpochS
    val minTtl = readUnsignedVInt(d)
    val keyType = readVintString(d)
    val nClustering = readUnsignedVInt(d)
    if (nClustering < 0 || nClustering > 1024)
      throw new java.io.IOException(s"implausible clustering count $nClustering")
    val clustering = (0L until nClustering).map(_ => readVintString(d))
    def readColumns(): Seq[ColumnSpec] = {
      val n = readUnsignedVInt(d)
      if (n < 0 || n > 4096)
        throw new java.io.IOException(s"implausible column count $n")
      (0L until n).map(_ => ColumnSpec(readVintBytes(d), readVintString(d)))
    }
    val statics = readColumns()
    val regulars = readColumns()
    SerializationHeaderInfo(minTs, minLdt, minTtl, keyType, clustering,
      statics, regulars)
  }

  // ------------------------------------------------------------- writing

  /** One cell to write: `columnIdx` indexes the header's regular columns;
    * `path` is required for complex columns (the map key / set element /
    * list position blob) and must be null for simple ones. */
  final case class WriteCell(
      columnIdx: Int,
      path: Array[Byte],
      isDeleted: Boolean,
      isExpiring: Boolean,
      timestampUs: Long,
      ttlS: Long,
      localDeletionTimeS: Long,
      value: Array[Byte])

  sealed trait WriteUnfiltered
  /** A row at `clustering`; cells must be grouped by column in header
    * order (complex columns' cells in path order).
    *
    * Row-level metadata (round 9): `pkLiveness` = (timestampUs, ttlS,
    * localDeletionTimeS) primary-key liveness — ttlS < 0 writes timestamp
    * only (HAS_TIMESTAMP without HAS_TTL); `rowDeletion` = (timestampUs,
    * localDeletionTimeS) row deletion; `complexDeletion` = (timestampUs,
    * localDeletionTimeS) applied to EVERY present complex column (the
    * HAS_COMPLEX_DELETION row flag is all-or-nothing per this writer's
    * model; Cassandra's per-column LIVE sentinel is not modeled).
    *
    * `emptyComplexColumns` (round 11): complex columns to include in the
    * row's column subset with ZERO cells — the shape a compacted row
    * takes when a complex deletion survives but every cell it shadowed
    * is gone (the deletion still needs its column slot: Cassandra stores
    * complex deletions per present complex column). */
  final case class WriteRow(clustering: Long, cells: Seq[WriteCell],
      pkLiveness: Option[(Long, Long, Long)] = None,
      rowDeletion: Option[(Long, Long)] = None,
      complexDeletion: Option[(Long, Long)] = None,
      emptyComplexColumns: Seq[Int] = Nil)
      extends WriteUnfiltered
  /** A static row: cells' `columnIdx` indexes the header's STATIC
    * columns; written with the EXTENSION/IS_STATIC flag pair and no
    * clustering block. Must be the partition's first unfiltered.
    * Carries the same optional pk liveness / row deletion /
    * complex-column deletion as a regular row (Cassandra's static Row
    * is the same Row structure, so complex STATIC columns serialize
    * exactly like complex regulars: optional complex deletion, cell
    * count, then path-ordered cells). */
  final case class WriteStaticRow(cells: Seq[WriteCell],
      pkLiveness: Option[(Long, Long, Long)] = None,
      rowDeletion: Option[(Long, Long)] = None,
      complexDeletion: Option[(Long, Long)] = None)
      extends WriteUnfiltered
  final case class WriteMarker(clustering: Long, kind: Int,
      markedForDeleteAtUs: Long, localDeletionTimeS: Long)
      extends WriteUnfiltered

  /** Tracks the previous unfiltered's total serialized size — the
    * `previousUnfilteredSize` vint big-format readers use for reverse
    * iteration. One instance per Data.db file.
    *
    * Positions are tracked through a LONG byte counter of our own
    * (round 11): `DataOutputStream.size()` saturates at Int.MaxValue,
    * which would silently corrupt every recorded offset past 2 GiB —
    * exactly the file sizes the spill-bounded sink exists to stream.
    * `sink` may be any OutputStream (the previous DataOutputStream call
    * sites still compile; the extra write-through layer costs nothing
    * and buffers nothing, so the caller's flush/close semantics are
    * unchanged). */
  final class Writer(sink: java.io.OutputStream,
      header: SerializationHeaderInfo) {
    require(header.clusteringTypes == Seq(Marshal.Prefix + "LongType"),
      "writer surface requires a single LongType clustering column")
    private val counting = new graft.sources.CountingOutputStream(sink)
    private val out = new DataOutputStream(counting)
    private var prevSize = 0L

    def position: Long = counting.count

    /** `deletion` = (markedForDeleteAtUs, localDeletionTimeS) writes a
      * real partition-level deletion; None writes DeletionTime.LIVE. */
    def writePartitionStart(key: Array[Byte],
        deletion: Option[(Long, Long)] = None): Unit = {
      out.writeShort(key.length)
      out.write(key)
      // DeletionTime.serializer writes localDeletionTime then
      // markedForDeleteAt; LIVE = (Int.MaxValue, Long.MinValue)
      out.writeInt(deletion.map(_._2.toInt).getOrElse(Int.MaxValue))
      out.writeLong(deletion.map(_._1).getOrElse(Long.MinValue))
      prevSize = 0L
    }

    def writePartitionEnd(): Unit = out.writeByte(EndOfPartition)

    private def writeDeltaTs(d: DataOutput, ts: Long): Unit =
      writeUnsignedVInt(d, ts - header.minTimestampUs)
    private def writeDeltaLdt(d: DataOutput, ldt: Long): Unit =
      writeUnsignedVInt(d, ldt - header.minLocalDeletionTimeS)
    private def writeDeltaTtl(d: DataOutput, ttl: Long): Unit =
      writeUnsignedVInt(d, ttl - header.minTtlS)

    private def writeCell(d: DataOutput, c: WriteCell,
        columns: Seq[ColumnSpec] = header.regularColumns): Unit = {
      val spec = columns(c.columnIdx)
      val hasValue = !spec.valueAbsent && !c.isDeleted && c.value != null &&
        c.value.length > 0
      var flags = 0
      if (c.isDeleted) flags |= CellIsDeleted
      if (c.isExpiring) flags |= CellIsExpiring
      if (!hasValue) flags |= CellHasEmptyValue
      d.write(flags)
      writeDeltaTs(d, c.timestampUs)
      if (c.isDeleted || c.isExpiring) writeDeltaLdt(d, c.localDeletionTimeS)
      if (c.isExpiring) writeDeltaTtl(d, c.ttlS)
      if (spec.isComplex) writeVintBytes(d, c.path)
      if (hasValue) {
        if (spec.valueFixedLen >= 0) {
          require(c.value.length == spec.valueFixedLen,
            s"fixed-length value mismatch for ${spec.name}")
          d.write(c.value)
        } else writeVintBytes(d, c.value)
      }
    }

    /** bit 2i = empty, bit 2i+1 = null (we write neither: a LongType
      * clustering value is always present). */
    private def writeClusteringBlock(d: DataOutput, clustering: Long): Unit = {
      writeUnsignedVInt(d, 0L) // header word: not null, not empty
      d.writeLong(clustering) // LongType: fixed 8 bytes, big-endian
    }

    def write(u: WriteUnfiltered): Unit = u match {
      case r: WriteRow => writeRow(r)
      case s: WriteStaticRow => writeStaticRow(s)
      case m: WriteMarker => writeMarker(m)
    }

    /** Subset bitmap (Columns.serializer.serializeSubset: unsigned-vint
      * bitmap of the superset positions ABSENT from the row; ≤ 64). */
    private def writeSubset(bd: DataOutput, present: Seq[Int],
        superset: Seq[ColumnSpec]): Unit = {
      require(superset.length <= 64,
        "subset encoding beyond 64 columns not supported")
      var bitmap = 0L
      superset.indices.foreach { i =>
        if (!present.contains(i)) bitmap |= (1L << i)
      }
      writeUnsignedVInt(bd, bitmap)
    }

    private def writeRow(r: WriteRow): Unit = {
      r.emptyComplexColumns.foreach(i =>
        require(header.regularColumns(i).isComplex,
          s"emptyComplexColumns names simple column " +
            header.regularColumns(i).name))
      val present =
        (r.cells.map(_.columnIdx) ++ r.emptyComplexColumns).distinct.sorted
      val all = present.length == header.regularColumns.length
      var flags = 0
      if (all) flags |= HasAllColumns
      if (r.pkLiveness.isDefined) flags |= HasTimestamp
      if (r.pkLiveness.exists(_._2 >= 0)) flags |= HasTtl
      if (r.rowDeletion.isDefined) flags |= HasDeletion
      if (r.complexDeletion.isDefined) flags |= HasComplexDeletion
      // body: [pk liveness] [row deletion] [subset] + column data
      val body = new ByteArrayOutputStream()
      val bd = new DataOutputStream(body)
      r.pkLiveness.foreach { case (ts, ttl, ldt) =>
        writeDeltaTs(bd, ts)
        if (ttl >= 0) { writeDeltaTtl(bd, ttl); writeDeltaLdt(bd, ldt) }
      }
      r.rowDeletion.foreach { case (ts, ldt) =>
        writeDeltaTs(bd, ts); writeDeltaLdt(bd, ldt)
      }
      if (!all) writeSubset(bd, present, header.regularColumns)
      present.foreach { colIdx =>
        val cells = r.cells.filter(_.columnIdx == colIdx)
        if (header.regularColumns(colIdx).isComplex) {
          // complex deletion (when the row carries one) precedes the cell
          // count; then the cells
          r.complexDeletion.foreach { case (ts, ldt) =>
            writeDeltaTs(bd, ts); writeDeltaLdt(bd, ldt)
          }
          writeUnsignedVInt(bd, cells.length.toLong)
          cells.foreach(writeCell(bd, _))
        } else {
          require(cells.length == 1,
            s"simple column ${header.regularColumns(colIdx).name} with " +
              s"${cells.length} cells")
          writeCell(bd, cells.head)
        }
      }
      val bodyBytes = body.toByteArray
      val before = position
      out.writeByte(flags)
      writeClusteringBlock(out, r.clustering)
      writeUnsignedVInt(out, bodyBytes.length.toLong)
      writeUnsignedVInt(out, prevSize)
      out.write(bodyBytes)
      prevSize = position - before
    }

    private def writeStaticRow(s: WriteStaticRow): Unit = {
      val statics = header.staticColumns
      require(statics.nonEmpty, "static row but header has no static columns")
      val present = s.cells.map(_.columnIdx).distinct.sorted
      val all = present.length == statics.length
      var flags = ExtensionFlag
      if (all) flags |= HasAllColumns
      if (s.pkLiveness.isDefined) flags |= HasTimestamp
      if (s.pkLiveness.exists(_._2 >= 0)) flags |= HasTtl
      if (s.rowDeletion.isDefined) flags |= HasDeletion
      if (s.complexDeletion.isDefined) flags |= HasComplexDeletion
      val body = new ByteArrayOutputStream()
      val bd = new DataOutputStream(body)
      s.pkLiveness.foreach { case (ts, ttl, ldt) =>
        writeDeltaTs(bd, ts)
        if (ttl >= 0) { writeDeltaTtl(bd, ttl); writeDeltaLdt(bd, ldt) }
      }
      s.rowDeletion.foreach { case (ts, ldt) =>
        writeDeltaTs(bd, ts); writeDeltaLdt(bd, ldt)
      }
      if (!all) writeSubset(bd, present, statics)
      present.foreach { colIdx =>
        val cells = s.cells.filter(_.columnIdx == colIdx)
        if (statics(colIdx).isComplex) {
          s.complexDeletion.foreach { case (ts, ldt) =>
            writeDeltaTs(bd, ts); writeDeltaLdt(bd, ldt)
          }
          writeUnsignedVInt(bd, cells.length.toLong)
          cells.foreach(writeCell(bd, _, statics))
        } else {
          require(cells.length == 1,
            s"static column ${statics(colIdx).name} with ${cells.length} cells")
          writeCell(bd, cells.head, statics)
        }
      }
      val bodyBytes = body.toByteArray
      val before = position
      out.writeByte(flags)
      out.writeByte(IsStatic) // extended flags: no clustering block follows
      writeUnsignedVInt(out, bodyBytes.length.toLong)
      writeUnsignedVInt(out, prevSize)
      out.write(bodyBytes)
      prevSize = position - before
    }

    private def writeMarker(m: WriteMarker): Unit = {
      val body = new ByteArrayOutputStream()
      val bd = new DataOutputStream(body)
      val isBoundary = m.kind == KindExclEndInclStartBoundary ||
        m.kind == KindInclEndExclStartBoundary
      // bounds carry one DeletionTime, boundaries two (end then start);
      // the fixture writes bounds — a boundary writes the same time twice
      writeDeltaTs(bd, m.markedForDeleteAtUs)
      writeDeltaLdt(bd, m.localDeletionTimeS)
      if (isBoundary) {
        writeDeltaTs(bd, m.markedForDeleteAtUs)
        writeDeltaLdt(bd, m.localDeletionTimeS)
      }
      val bodyBytes = body.toByteArray
      val before = position
      out.writeByte(IsMarker)
      out.writeByte(m.kind)
      out.writeShort(1) // bound size: one clustering value
      writeClusteringBlock(out, m.clustering)
      writeUnsignedVInt(out, bodyBytes.length.toLong)
      writeUnsignedVInt(out, prevSize)
      out.write(bodyBytes)
      prevSize = position - before
    }
  }

  // ---------------------------------------------------- promoted index

  /** One `IndexInfo` block of a big-format promoted (row) index: the
    * clustering range a block covers, its byte offset from the partition
    * start and its width, plus the open-marker flag (with its deletion
    * time when set). Kinds are ClusteringPrefix ordinals. */
  final case class IndexInfo(
      firstKind: Int, firstClustering: Long,
      lastKind: Int, lastClustering: Long,
      offset: Long, width: Long,
      endOpenMarker: Option[(Long, Long)]) // (markedForDeleteAtUs, ldtS)

  /** A partition's promoted index (`RowIndexEntry.IndexedEntry` body):
    * headerLength = bytes from partition start to the first unfiltered
    * (key header + partition DeletionTime); partition-level deletion; the
    * IndexInfo blocks; and the trailing block-offset array readers
    * binary-search. */
  final case class PromotedIndex(
      headerLength: Long,
      deletionLdtS: Long, deletionMfdaUs: Long,
      blocks: IndexedSeq[IndexInfo])

  /** IndexInfo.Serializer's width delta base (64 KiB — widths are stored
    * as a signed vint delta against it). */
  val WidthBase = 65536L

  private def writeIndexClustering(d: DataOutput, kind: Int,
      clustering: Long): Unit = {
    d.write(kind)
    if (kind != KindClustering) d.writeShort(1) // bound size
    writeUnsignedVInt(d, 0L) // clustering block header: present, not empty
    d.writeLong(clustering)
  }

  private def readIndexClustering(d: DataInput): (Int, Long) = {
    val kind = d.readByte().toInt
    if (kind != KindClustering) {
      val size = d.readShort().toInt
      require(size == 1, s"unexpected bound size $size")
    }
    val header = readUnsignedVInt(d)
    require(header == 0L, s"null/empty clustering in index block")
    (kind, d.readLong())
  }

  /** Serializes a promoted index exactly as `RowIndexEntry.IndexedEntry`:
    * headerLength vint, partition DeletionTime, block count vint, the
    * IndexInfo entries (clustering prefixes, offset vint, width as signed
    * vint delta vs [[WidthBase]], end-open-marker flag + DeletionTime),
    * then the block-offset int array (offsets of each IndexInfo from the
    * start of the first one). */
  def serializePromotedIndex(p: PromotedIndex): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    writeUnsignedVInt(d, p.headerLength)
    d.writeInt(p.deletionLdtS.toInt)
    d.writeLong(p.deletionMfdaUs)
    writeUnsignedVInt(d, p.blocks.length.toLong)
    val offsets = new Array[Int](p.blocks.length)
    val blockBase = d.size()
    p.blocks.zipWithIndex.foreach { case (b, i) =>
      offsets(i) = d.size() - blockBase
      writeIndexClustering(d, b.firstKind, b.firstClustering)
      writeIndexClustering(d, b.lastKind, b.lastClustering)
      writeUnsignedVInt(d, b.offset)
      writeVInt(d, b.width - WidthBase)
      d.writeBoolean(b.endOpenMarker.isDefined)
      b.endOpenMarker.foreach { case (mfdaUs, ldtS) =>
        d.writeInt(ldtS.toInt)
        d.writeLong(mfdaUs)
      }
    }
    offsets.foreach(d.writeInt)
    bos.toByteArray
  }

  def parsePromotedIndex(bytes: Array[Byte]): PromotedIndex = {
    val d = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val headerLength = readUnsignedVInt(d)
    val ldt = d.readInt().toLong
    val mfda = d.readLong()
    val n = readUnsignedVInt(d)
    require(n >= 0 && n <= (1 << 24), s"implausible block count $n")
    val blocks = (0 until n.toInt).map { _ =>
      val (fk, fc) = readIndexClustering(d)
      val (lk, lc) = readIndexClustering(d)
      val offset = readUnsignedVInt(d)
      val width = readVInt(d) + WidthBase
      val marker =
        if (d.readBoolean()) {
          val mLdt = d.readInt().toLong
          val mMfda = d.readLong()
          Some((mMfda, mLdt))
        } else None
      IndexInfo(fk, fc, lk, lc, offset, width, marker)
    }
    // trailing offsets array: verify it matches the blocks just read
    val expected = {
      val sizes = blocks.map { b =>
        def clSize(kind: Int): Int = (if (kind != KindClustering) 3 else 1) + 9
        clSize(b.firstKind) + clSize(b.lastKind) +
          vintSize(b.offset) + svintSize(b.width - WidthBase) + 1 +
          (if (b.endOpenMarker.isDefined) 12 else 0)
      }
      sizes.scanLeft(0)(_ + _).dropRight(1)
    }
    blocks.indices.foreach { i =>
      val off = d.readInt()
      require(off == expected(i),
        s"promoted-index offset table mismatch at $i: $off != ${expected(i)}")
    }
    PromotedIndex(headerLength, ldt, mfda, blocks)
  }

  private def vintSize(v: Long): Int =
    graft.sources.indexdb.IndexDbFormat.unsignedVIntSize(v)
  private def svintSize(v: Long): Int =
    vintSize((v << 1) ^ (v >> 63))

  // ------------------------------------------------------------- parsing

  /** Streaming event iterator over a real big-format Data.db stream,
    * decoded through `header`. Emits the SAME [[DataDbFormat.Event]] shape
    * as the engine-format parser so every downstream pipeline runs
    * unchanged; `size_bytes` carries the cell's VALUE length (markers and
    * valueless cells: 0) — the roundtrip-checkable size the real encoding
    * exposes per cell.
    *
    * Markers surface with a synthesized column name `range:<clustering>`
    * (real markers name no column; the clustering bound is the identity),
    * matching the fixture relation's rendering. */
  /** Streaming event decode. `stopAtBoundary` is polled at partition
    * boundaries AND between unfiltereds, so a range may end at any
    * promoted-index block boundary (unfiltereds tile the partition byte
    * range — the poll can only fire true exactly on a tile edge).
    * `startKey`, when non-null, starts the decode MID-PARTITION: the
    * stream is already positioned at an unfiltered boundary inside the
    * partition whose key is `startKey` (the split planner takes both from
    * the Index.db entry's promoted index), so no key header is read first
    * — the role `RowIndexEntry` plays for Cassandra's own sliced reads. */
  /** `keepValues`: retain each cell's stored value bytes on the emitted
    * event (the scan sets this ONLY when the `value` column survives
    * pruning — otherwise values are skipped, never allocated). */
  def events(stream: InputStream, header: SerializationHeaderInfo,
      stopAtBoundary: () => Boolean = () => false,
      startKey: Array[Byte] = null,
      keepValues: Boolean = false): Iterator[DataDbFormat.Event] = {
    require(header.clusteringTypes == Seq(Marshal.Prefix + "LongType"),
      "event surface requires a single LongType clustering column")
    val regulars = header.regularColumns.toArray
    val colNameBytes = regulars.map(_.nameBytes)
    val statics = header.staticColumns.toArray
    val staticNameBytes = statics.map(_.nameBytes)

    new Iterator[DataDbFormat.Event] {
      private val in = new DataInputStream(stream)
      private var currentKey: Array[Byte] = startKey
      private var pending: List[DataDbFormat.Event] = Nil
      private var done = false

      // one reusable body buffer + array-backed DataInput for the whole
      // scan (round 19): the decode previously allocated a body array, a
      // ByteArrayInputStream (synchronized read per byte) and a
      // DataInputStream per unfiltered
      private var bodyBuf = new Array[Byte](1 << 12)
      private val bodyReader = new graft.sources.ByteReader
      private def readBody(size: Int): graft.sources.ByteReader = {
        if (bodyBuf.length < size) {
          var n = bodyBuf.length
          while (n < size) n <<= 1
          bodyBuf = new Array[Byte](n)
        }
        in.readFully(bodyBuf, 0, size)
        bodyReader.reset(bodyBuf, 0, size)
      }

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
        // partition-level DeletionTime (localDeletionTime int,
        // markedForDeleteAt long): a non-LIVE value surfaces as a
        // PARTITION_DELETION event sorting before everything else in the
        // partition (round 9; previously parsed but dropped)
        val ldt = in.readInt()
        val mfda = in.readLong()
        if (ldt != Int.MaxValue || mfda != Long.MinValue)
          pending = DataDbFormat.Event(currentKey,
            DataDbFormat.PartitionClustering, Array.emptyByteArray,
            DataDbFormat.KindCodePartitionDeletion,
            DataDbFormat.flagsOf(tombstone = true, expiring = false,
              counter = false, live = false),
            mfda, NoTtlS, ldt.toLong, 0L) :: pending
        true
      }

      private def readDeltaTs(d: DataInput): Long =
        readUnsignedVInt(d) + header.minTimestampUs
      private def readDeltaLdt(d: DataInput): Long =
        readUnsignedVInt(d) + header.minLocalDeletionTimeS
      private def readDeltaTtl(d: DataInput): Long =
        readUnsignedVInt(d) + header.minTtlS

      /** Single clustering value per the header; null/empty bits of the
        * block header word reject (a LongType clustering is never absent
        * in files this engine targets). */
      private def readClusteringValue(d: DataInput): Long = {
        val headerWord = readUnsignedVInt(d)
        if (headerWord != 0L)
          throw new java.io.IOException(
            s"null/empty clustering value (header word $headerWord)")
        d.readLong()
      }

      private def readCell(d: DataInput, spec: ColumnSpec,
          nameBytes: Array[Byte], clustering: Long,
          kindCode: Int): DataDbFormat.Event = {
        val flags = d.readUnsignedByte()
        if ((flags & (CellUseRowTimestamp | CellUseRowTtl)) != 0)
          throw new java.io.IOException(
            "row-liveness-relative cells unsupported (no pk liveness written)")
        val deleted = (flags & CellIsDeleted) != 0
        val expiring = (flags & CellIsExpiring) != 0
        val hasValue = (flags & CellHasEmptyValue) == 0
        val ts = readDeltaTs(d)
        val ldt =
          if (deleted || expiring) readDeltaLdt(d) else NoDeletionTimeS
        val ttl = if (expiring) readDeltaTtl(d) else NoTtlS
        if (spec.isComplex) {
          val pathLen = readUnsignedVInt(d)
          if (pathLen < 0 || pathLen > (1 << 16))
            throw new java.io.IOException(s"implausible cell path $pathLen")
          d.skipBytes(pathLen.toInt)
        }
        var valueLen = 0L
        var valueBytes: Array[Byte] = null
        if (hasValue) {
          val fixed = spec.valueFixedLen
          valueLen = if (fixed >= 0) fixed.toLong else readUnsignedVInt(d)
          if (valueLen < 0 || valueLen > (1 << 28))
            throw new java.io.IOException(s"implausible value length $valueLen")
          if (keepValues) {
            valueBytes = new Array[Byte](valueLen.toInt)
            d.readFully(valueBytes)
          } else {
            var remaining = valueLen.toInt
            while (remaining > 0) {
              val skipped = d.skipBytes(remaining)
              if (skipped <= 0) throw new EOFException("truncated cell value")
              remaining -= skipped
            }
          }
        } else if (keepValues && !deleted) valueBytes = Array.emptyByteArray
        DataDbFormat.Event(
          key = currentKey,
          clustering = clustering,
          columnNameBytes = nameBytes,
          kindCode = kindCode,
          flags = DataDbFormat.flagsOf(tombstone = deleted,
            expiring = expiring, counter = spec.isCounter, live = !deleted),
          timestampUs = ts,
          ttlS = ttl,
          localDeletionTimeS = ldt,
          sizeBytes = valueLen,
          value = valueBytes)
      }

      /** Reads one unfiltered; returns its events (Nil at end of
        * partition). Beyond plain cells, the row-level metadata the real
        * format carries is SURFACED as typed events (round 9; previously
        * parsed for stream integrity only): static-row cells
        * (`STATIC_CELL` at the static clustering sentinel), primary-key
        * liveness (`ROW_LIVENESS`), row deletions (`ROW_DELETION`) and
        * complex-column deletions (`COMPLEX_DELETION`). */
      private def readUnfiltered(): List[DataDbFormat.Event] = {
        val flags = in.readUnsignedByte()
        if ((flags & EndOfPartition) != 0) { currentKey = null; return Nil }
        if ((flags & IsMarker) != 0) return readMarker() :: Nil
        val extended =
          if ((flags & ExtensionFlag) != 0) in.readUnsignedByte() else 0
        if ((extended & IsStatic) != 0) return readStaticRow(flags)
        val clustering = readClusteringValue(in)
        val bodySize = readUnsignedVInt(in)
        readUnsignedVInt(in) // previous unfiltered size (reverse iteration)
        if (bodySize < 0 || bodySize > (1 << 28))
          throw new java.io.IOException(s"implausible row body $bodySize")
        val d = readBody(bodySize.toInt)
        val out = List.newBuilder[DataDbFormat.Event]
        // primary-key liveness: write timestamp (+ row TTL) for the whole
        // row — surfaced as one ROW_LIVENESS event with an empty column
        if ((flags & HasTimestamp) != 0) {
          val ts = readDeltaTs(d)
          var ttl = NoTtlS
          var ldt = NoDeletionTimeS
          if ((flags & HasTtl) != 0) { ttl = readDeltaTtl(d); ldt = readDeltaLdt(d) }
          out += DataDbFormat.Event(currentKey, clustering,
            Array.emptyByteArray, DataDbFormat.KindCodeRowLiveness,
            DataDbFormat.flagsOf(tombstone = false,
              expiring = (flags & HasTtl) != 0, counter = false, live = true),
            ts, ttl, ldt, 0L)
        }
        // row deletion: the whole row is deleted at (ts, ldt)
        if ((flags & HasDeletion) != 0) {
          val ts = readDeltaTs(d)
          val ldt = readDeltaLdt(d)
          out += DataDbFormat.Event(currentKey, clustering,
            Array.emptyByteArray, DataDbFormat.KindCodeRowDeletion,
            DataDbFormat.flagsOf(tombstone = true, expiring = false,
              counter = false, live = false),
            ts, NoTtlS, ldt, 0L)
        }
        val present: Array[Int] =
          if ((flags & HasAllColumns) != 0) regulars.indices.toArray
          else {
            // unsigned-vint bitmap of ABSENT superset positions (≤ 64)
            val bitmap = readUnsignedVInt(d)
            regulars.indices.filter(i => (bitmap & (1L << i)) == 0L).toArray
          }
        present.foreach { colIdx =>
          if (regulars(colIdx).isComplex) {
            if ((flags & HasComplexDeletion) != 0) {
              // complex-column deletion: all of this column's prior cells
              // are deleted at (ts, ldt)
              val ts = readDeltaTs(d)
              val ldt = readDeltaLdt(d)
              out += DataDbFormat.Event(currentKey, clustering,
                colNameBytes(colIdx), DataDbFormat.KindCodeComplexDeletion,
                DataDbFormat.flagsOf(tombstone = true, expiring = false,
                  counter = false, live = false),
                ts, NoTtlS, ldt, 0L)
            }
            val n = readUnsignedVInt(d)
            if (n < 0 || n > (1 << 20))
              throw new java.io.IOException(s"implausible cell count $n")
            var i = 0L
            while (i < n) {
              out += readCell(d, regulars(colIdx), colNameBytes(colIdx),
                clustering, DataDbFormat.KindCodeCell)
              i += 1
            }
          } else out += readCell(d, regulars(colIdx), colNameBytes(colIdx),
            clustering, DataDbFormat.KindCodeCell)
        }
        if (d.available != 0)
          throw new java.io.IOException(
            s"row body size mismatch: ${d.available} bytes left of $bodySize")
        out.result()
      }

      /** Static row: no clustering block; cells decode against the
        * header's STATIC columns and surface at the static clustering
        * sentinel, as do the row's optional liveness/deletion events
        * (Cassandra's static Row is the same Row structure). Complex
        * STATIC columns decode exactly like complex regulars — optional
        * complex deletion (surfaced as `COMPLEX_DELETION` at the static
        * sentinel), cell count, path-ordered cells. */
      private def readStaticRow(flags: Int): List[DataDbFormat.Event] = {
        if (statics.isEmpty)
          throw new java.io.IOException(
            "static row but header declares no static columns")
        val bodySize = readUnsignedVInt(in)
        readUnsignedVInt(in) // previous unfiltered size
        if (bodySize < 0 || bodySize > (1 << 28))
          throw new java.io.IOException(s"implausible static body $bodySize")
        val d = readBody(bodySize.toInt)
        val out = List.newBuilder[DataDbFormat.Event]
        if ((flags & HasTimestamp) != 0) {
          val ts = readDeltaTs(d)
          var ttl = NoTtlS
          var ldt = NoDeletionTimeS
          if ((flags & HasTtl) != 0) { ttl = readDeltaTtl(d); ldt = readDeltaLdt(d) }
          out += DataDbFormat.Event(currentKey,
            DataDbFormat.StaticClustering, Array.emptyByteArray,
            DataDbFormat.KindCodeRowLiveness,
            DataDbFormat.flagsOf(tombstone = false,
              expiring = (flags & HasTtl) != 0, counter = false, live = true),
            ts, ttl, ldt, 0L)
        }
        if ((flags & HasDeletion) != 0) {
          val ts = readDeltaTs(d)
          val ldt = readDeltaLdt(d)
          out += DataDbFormat.Event(currentKey,
            DataDbFormat.StaticClustering, Array.emptyByteArray,
            DataDbFormat.KindCodeRowDeletion,
            DataDbFormat.flagsOf(tombstone = true, expiring = false,
              counter = false, live = false),
            ts, NoTtlS, ldt, 0L)
        }
        val present: Array[Int] =
          if ((flags & HasAllColumns) != 0) statics.indices.toArray
          else {
            val bitmap = readUnsignedVInt(d)
            statics.indices.filter(i => (bitmap & (1L << i)) == 0L).toArray
          }
        present.foreach { colIdx =>
          if (statics(colIdx).isComplex) {
            if ((flags & HasComplexDeletion) != 0) {
              val ts = readDeltaTs(d)
              val ldt = readDeltaLdt(d)
              out += DataDbFormat.Event(currentKey,
                DataDbFormat.StaticClustering, staticNameBytes(colIdx),
                DataDbFormat.KindCodeComplexDeletion,
                DataDbFormat.flagsOf(tombstone = true, expiring = false,
                  counter = false, live = false),
                ts, NoTtlS, ldt, 0L)
            }
            val n = readUnsignedVInt(d)
            if (n < 0 || n > (1 << 20))
              throw new java.io.IOException(s"implausible cell count $n")
            var i = 0L
            while (i < n) {
              out += readCell(d, statics(colIdx), staticNameBytes(colIdx),
                DataDbFormat.StaticClustering,
                DataDbFormat.KindCodeStaticCell)
              i += 1
            }
          } else out += readCell(d, statics(colIdx), staticNameBytes(colIdx),
            DataDbFormat.StaticClustering, DataDbFormat.KindCodeStaticCell)
        }
        if (d.available != 0)
          throw new java.io.IOException(
            s"static body size mismatch: ${d.available} bytes left")
        out.result()
      }

      private def readMarker(): DataDbFormat.Event = {
        val kind = in.readUnsignedByte()
        val boundSize = in.readUnsignedShort()
        if (boundSize != 1)
          throw new java.io.IOException(
            s"marker bound with $boundSize values (engine surface needs 1)")
        val clustering = readClusteringValue(in)
        val bodySize = readUnsignedVInt(in)
        readUnsignedVInt(in) // previous unfiltered size
        if (bodySize < 0 || bodySize > (1 << 20))
          throw new java.io.IOException(s"implausible marker body $bodySize")
        val d = readBody(bodySize.toInt)
        val ts = readDeltaTs(d)
        val ldt = readDeltaLdt(d)
        val isBoundary = kind == KindExclEndInclStartBoundary ||
          kind == KindInclEndExclStartBoundary
        if (isBoundary) { readDeltaTs(d); readDeltaLdt(d) }
        if (d.available != 0)
          throw new java.io.IOException("marker body size mismatch")
        DataDbFormat.Event(
          key = currentKey,
          clustering = clustering,
          columnNameBytes = ("range:" + clustering)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          kindCode = DataDbFormat.KindCodeMarker,
          flags = DataDbFormat.flagsOf(tombstone = true, expiring = false,
            counter = false, live = false),
          timestampUs = ts,
          ttlS = NoTtlS,
          localDeletionTimeS = ldt,
          sizeBytes = 0L)
      }

      private def advance(): Unit = {
        while (pending.isEmpty && !done) {
          if (currentKey == null) {
            if (!readKeyHeader()) return
          } else if (stopAtBoundary()) {
            // mid-partition range end: only ever true on an unfiltered
            // tile edge (block boundary) — the rest of the partition
            // belongs to the next split
            done = true; in.close(); return
          }
          // readKeyHeader may have queued a PARTITION_DELETION event;
          // the next unfiltered is read on the following call
          if (pending.isEmpty) pending = readUnfiltered()
        }
      }

      override def hasNext: Boolean = {
        if (!done && pending.isEmpty) advance()
        pending.nonEmpty
      }
      override def next(): DataDbFormat.Event = {
        if (!hasNext) throw new NoSuchElementException
        val e = pending.head
        pending = pending.tail
        e
      }
    }
  }
}
