package graft.sources.commitlog

import java.io.{DataInput, DataOutput}
import java.util.zip.CRC32

import scala.collection.mutable.ArrayBuffer

/** Cassandra-shaped commitlog (write-ahead log) segment codec.
  *
  * Layout follows the public commitlog structure (Cassandra's
  * `CommitLogDescriptor` / `CommitLogSegment`, the format every
  * `CommitLog-<version>-<id>.log` on disk carries):
  *
  *  - **descriptor header**: `[int version][long segment id]
  *    [short params length][params UTF-8 bytes][int CRC32]`, the CRC
  *    computed over version, the id's two halves and the params bytes
  *    (the real descriptor's `updateChecksumInt` sequence) — a torn or
  *    foreign header fails closed before any entry is trusted;
  *  - **sync sections**: the body is a chain of sections, each opened
  *    by a sync marker `[int next-marker file position][int CRC32
  *    (segment id, marker position)]`. The final marker writes
  *    `next = 0` — the recovery stop signal. A replayer trusts ONLY
  *    bytes behind a valid marker chain: data after the last synced
  *    marker was never fsync'd and is ignored, exactly the crash
  *    contract the chain exists to encode;
  *  - **entries**: within a section, each mutation serializes as
  *    `[int size][int CRC32(size)][payload][int CRC32(payload)]` — the
  *    size CRC rejects torn length prefixes before any allocation, the
  *    payload CRC rejects torn tails.
  *
  * The mutation payload is this engine's documented analog (no
  * cassandra-all in the sandbox to emit the java-serialized
  * `Mutation`): one cell event in field order `key(8) clustering(8)
  * column_name(UTF) kind(UTF) timestamp_us(8) ttl_s(8)
  * local_deletion_time_s(8) is_tombstone(1) is_expiring(1)
  * size_bytes(8)` — 54 bytes + the two UTF strings, every field length
  * recomputable by the SQL oracle.
  *
  * Scale shape: a WAL is a per-node sequential artifact — nodes write
  * it, the engine only READS it, one task per segment (segments are
  * bounded at [[SegmentBytes]], so a 100 TB cluster's log is many
  * small independent files, embarrassingly parallel). Reference:
  * the reference repo reads only sstables at rest
  * (instaclustr/cassandra-sstable-tools has no commitlog reader);
  * this family extends the same lifecycle one stage earlier. */
object CommitLogFormat {

  /** Descriptor version (the 4.x-era messaging version the real
    * filename carries). */
  val Version = 7

  /** Segment roll threshold: an entry belongs to segment
    * `floor(cumulative entry-byte start / SegmentBytes)` over the
    * append order (real default is 32 MiB; fixture-scale keeps several
    * segments per corpus). A div rule over the exclusive running sum —
    * not a greedy reset — so the SQL oracle derives the identical
    * assignment with one window cumulative sum. */
  val SegmentBytes = 262144L

  /** Sync-marker cadence: within a segment an entry belongs to section
    * `floor(cumulative entry-byte start within the segment /
    * SectionBytes)` (real cadence is the periodic fsync; the same div
    * rule keeps section counts oracle-derivable). */
  val SectionBytes = 32768L

  val NamePrefix = "CommitLog-"
  val Suffix = ".log"

  def segmentName(id: Long): String = s"$NamePrefix$Version-$id$Suffix"

  /** Hints files reuse the segment codec (real Cassandra hints carry
    * the same descriptor + CRC'd entry framing as the commitlog): one
    * file per (down target node, coordinating node), the segment id
    * encoding the pair so the parse is self-describing. */
  val HintsPrefix = "Hints-"

  def hintsName(target: Long, coordinator: Long): String =
    s"$HintsPrefix$Version-$target-$coordinator$Suffix"

  def hintsId(target: Long, coordinator: Long): Long =
    target * 16L + coordinator

  def hintsTargetOf(id: Long): Long = id / 16L
  def hintsCoordinatorOf(id: Long): Long = id % 16L

  /** One logged mutation: the engine's cell-event tuple in RAW
    * (pre-representation-mapping) form — the WAL records what the
    * client wrote, not what a Data.db scan renders. */
  final case class Mutation(
      key: Long, clustering: Long, columnName: String, kind: String,
      timestampUs: Long, ttlS: Long, localDeletionTimeS: Long,
      isTombstone: Boolean, isExpiring: Boolean, sizeBytes: Long)

  /** Fixed on-disk bytes per entry: the 54-byte fixed payload portion
    * plus 12 framing bytes (size int, size CRC, payload CRC). Entry
    * length = this + the two UTF string lengths — the ONE constant the
    * report and both SQL oracles share. */
  val FixedEntryBytes = 66

  /** Serialized payload length (54 fixed + writeUTF framing; both
    * strings are ASCII in this engine, so SQL `length()` matches). */
  def payloadLength(m: Mutation): Int =
    FixedEntryBytes - 12 + m.columnName.length + m.kind.length

  /** On-disk entry length: size int + size CRC + payload + payload
    * CRC. */
  def entryLength(m: Mutation): Int =
    entryLength(m.columnName, m.kind)

  /** [[entryLength]] from the two variable-length fields alone (ADVICE
    * r17): the ONE place the framing arithmetic lives — distributed
    * writers ([[graft.ops.WalWriter]]) size entries without building a
    * [[Mutation]], and a framing/UTF-accounting change here can never
    * silently diverge the two accountings. */
  def entryLength(columnName: String, kind: String): Int =
    FixedEntryBytes + columnName.length + kind.length

  private def crcInt(crc: CRC32, v: Int): Unit = {
    crc.update((v >>> 24) & 0xff); crc.update((v >>> 16) & 0xff)
    crc.update((v >>> 8) & 0xff); crc.update(v & 0xff)
  }

  /** Descriptor CRC over version, id halves, params bytes. */
  private def headerCrc(id: Long, params: Array[Byte]): Int = {
    val crc = new CRC32
    crcInt(crc, Version)
    crcInt(crc, (id & 0xffffffffL).toInt)
    crcInt(crc, (id >>> 32).toInt)
    crc.update(params)
    crc.getValue.toInt
  }

  /** Sync-marker CRC over (segment id, marker position). */
  private def markerCrc(id: Long, pos: Int): Int = {
    val crc = new CRC32
    crcInt(crc, (id & 0xffffffffL).toInt)
    crcInt(crc, (id >>> 32).toInt)
    crcInt(crc, pos)
    crc.getValue.toInt
  }

  private def payloadBytes(m: Mutation): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payloadLength(m))
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(m.key); out.writeLong(m.clustering)
    out.writeUTF(m.columnName); out.writeUTF(m.kind)
    out.writeLong(m.timestampUs); out.writeLong(m.ttlS)
    out.writeLong(m.localDeletionTimeS)
    out.writeBoolean(m.isTombstone); out.writeBoolean(m.isExpiring)
    out.writeLong(m.sizeBytes)
    out.flush()
    bos.toByteArray
  }

  /** Write one segment: descriptor header, then the entries chained
    * into sync sections cut every [[SectionBytes]] of entry bytes.
    * Returns the byte length written. */
  def writeSegment(out: DataOutput, id: Long,
      entries: Seq[Mutation]): Long = {
    val params = Array.emptyByteArray
    out.writeInt(Version); out.writeLong(id)
    out.writeShort(params.length); out.write(params)
    out.writeInt(headerCrc(id, params))
    var pos = 18L // header bytes written so far
    // pre-cut sections by the div rule (entry's cumulative start within
    // the segment, entries-only bytes) so each marker can state its
    // successor's position and the oracle can replay the cut
    val sections = ArrayBuffer.empty[ArrayBuffer[Mutation]]
    var cum = 0L
    entries.foreach { m =>
      val idx = (cum / SectionBytes).toInt
      while (sections.length <= idx) sections += ArrayBuffer.empty[Mutation]
      sections(idx) += m
      cum += entryLength(m)
    }
    sections.filter(_.nonEmpty).foreach { sec =>
      val bodyLen = sec.iterator.map(entryLength(_).toLong).sum
      val next = pos + 8L + bodyLen
      out.writeInt(next.toInt)
      out.writeInt(markerCrc(id, pos.toInt))
      sec.foreach { m =>
        val payload = payloadBytes(m)
        out.writeInt(payload.length)
        val sizeCrc = new CRC32
        crcInt(sizeCrc, payload.length)
        out.writeInt(sizeCrc.getValue.toInt)
        out.write(payload)
        val crc = new CRC32
        crc.update(payload)
        out.writeInt(crc.getValue.toInt)
      }
      pos = next
    }
    // recovery stop: the empty final marker
    out.writeInt(0)
    out.writeInt(markerCrc(id, pos.toInt))
    pos + 8L
  }

  final case class Section(offset: Long, entries: Int)

  final case class Segment(id: Long, mutations: Vector[Mutation],
      sections: Vector[Section], bytes: Long)

  /** Parse one segment fail-closed: a bad header, marker or entry CRC
    * throws (a real replayer stops at corruption rather than replay
    * garbage). */
  def parseSegment(bytes: Array[Byte]): Segment = {
    // array-backed reader (round 19): ByteArrayInputStream's read() is a
    // synchronized method, and DataInputStream.readInt over it paid four
    // monitor ops per marker/size word across every WAL segment byte
    val in = new graft.sources.ByteReader().reset(bytes)
    val version = in.readInt()
    require(version == Version, s"commitlog version $version != $Version")
    val id = in.readLong()
    val paramsLen = in.readShort() & 0xffff
    val params = new Array[Byte](paramsLen)
    in.readFully(params)
    val hCrc = in.readInt()
    require(hCrc == headerCrc(id, params),
      s"commitlog header CRC mismatch in segment $id")
    var pos = 18L + paramsLen
    val mutations = Vector.newBuilder[Mutation]
    val sections = Vector.newBuilder[Section]
    var done = false
    while (!done) {
      val next = in.readInt()
      val mCrc = in.readInt()
      require(mCrc == markerCrc(id, pos.toInt),
        s"sync marker CRC mismatch at $pos in segment $id")
      if (next == 0) done = true
      else {
        val sectionStart = pos
        pos += 8L
        var n = 0
        while (pos < next) {
          val size = in.readInt()
          val sCrc = in.readInt()
          val expect = new CRC32
          crcInt(expect, size)
          require(sCrc == expect.getValue.toInt,
            s"entry size CRC mismatch at $pos in segment $id")
          val payload = new Array[Byte](size)
          in.readFully(payload)
          val pCrc = in.readInt()
          val pe = new CRC32
          pe.update(payload)
          require(pCrc == pe.getValue.toInt,
            s"entry payload CRC mismatch at $pos in segment $id")
          mutations += parsePayload(payload)
          pos += 12L + size
          n += 1
        }
        require(pos == next,
          s"section overran its marker ($pos != $next) in segment $id")
        sections += Section(sectionStart, n)
      }
    }
    Segment(id, mutations.result(), sections.result(), pos + 8L)
  }

  private def parsePayload(payload: Array[Byte]): Mutation = {
    val in: DataInput = new graft.sources.ByteReader().reset(payload)
    Mutation(in.readLong(), in.readLong(), in.readUTF(), in.readUTF(),
      in.readLong(), in.readLong(), in.readLong(),
      in.readBoolean(), in.readBoolean(), in.readLong())
  }

  /** Segment id from a `CommitLog-7-<id>.log` path. */
  def idOf(path: String): Long = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    name.stripPrefix(s"$NamePrefix$Version-").stripSuffix(Suffix).toLong
  }
}
