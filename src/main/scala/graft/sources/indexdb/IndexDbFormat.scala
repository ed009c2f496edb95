package graft.sources.indexdb

import java.io.{DataInput, DataInputStream, DataOutput, EOFException, InputStream}

import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}

/** The SSTable partition-index (Index.db) on-disk format, as consumed by the
  * reference for its `pstats` path (cassandra/IndexReader.java:69-113, modern
  * "ma"+ sstable versions):
  *
  * ```
  * entry := key_len:uint16_be key:bytes[key_len]
  *          position:unsigned_vint              // offset into Data.db
  *          promoted_len:unsigned_vint promoted:bytes[promoted_len]  // skipped
  * file  := entry*
  * ```
  *
  * Unsigned vints are Cassandra's encoding: the count of leading 1-bits in
  * the first byte equals the number of extra bytes; the remaining bits of the
  * first byte are the value's most-significant bits, extra bytes follow
  * big-endian. Partition size is NOT stored — it is the delta of consecutive
  * positions (IndexReader.java:87-98), which [[IndexDb.withSizes]] re-derives
  * relationally with a `lead()` window.
  */
object IndexDbFormat {

  val Suffix = "-Index.db"

  val Schema: StructType = StructType(Seq(
    StructField("sstable_id", StringType, nullable = false),
    StructField("key", BinaryType, nullable = false),
    StructField("position", LongType, nullable = false)))

  /** Cassandra unsigned-vint decode (VIntCoding semantics). */
  def readUnsignedVInt(in: DataInput): Long = {
    val first = in.readByte()
    if (first >= 0) return first.toLong
    val extra = Integer.numberOfLeadingZeros(~first.toInt & 0xff) - 24
    var ret: Long = (first & (0xff >>> extra)).toLong
    var i = 0
    while (i < extra) {
      ret = (ret << 8) | (in.readByte() & 0xffL)
      i += 1
    }
    ret
  }

  /** Cassandra unsigned-vint encode (inverse of [[readUnsignedVInt]]).
    * "Unsigned" means the long's 64 bits are treated as an unsigned
    * quantity: a top-bit-set value (negative as a signed long) takes the
    * full 9-byte encoding (first byte 0xFF) and round-trips bit-exactly —
    * required by [[writeVInt]]'s zigzag output, which covers the whole
    * unsigned domain. */
  def writeUnsignedVInt(out: DataOutput, value: Long): Unit = {
    val magnitude = java.lang.Long.numberOfLeadingZeros(value | 1L)
    val size = (639 - magnitude * 9) >> 6 // bytes incl. first (Cassandra formula)
    if (size == 1) { out.write(value.toInt); return }
    val extra = size - 1
    val bytes = new Array[Byte](size)
    var v = value
    var i = extra
    while (i >= 0) { bytes(i) = v.toByte; v >>= 8; i -= 1 }
    bytes(0) = (bytes(0) | (0xff << (8 - extra)).toByte).toByte
    out.write(bytes, 0, size)
  }

  /** Cassandra signed-vint decode: zigzag over the unsigned encoding
    * (VIntCoding.readVInt semantics) — full signed-long domain. */
  def readVInt(in: DataInput): Long = {
    val z = readUnsignedVInt(in)
    (z >>> 1) ^ -(z & 1L)
  }

  /** Cassandra signed-vint encode (inverse of [[readVInt]]). */
  def writeVInt(out: DataOutput, value: Long): Unit =
    writeUnsignedVInt(out, (value << 1) ^ (value >> 63))

  /** One index entry for a test generator (promoted-index bytes are junk the
    * reader must skip, mirroring IndexReader.skipData). */
  def writeEntry(out: DataOutput, key: Array[Byte], position: Long,
      promoted: Array[Byte] = Array.emptyByteArray): Unit = {
    out.writeShort(key.length)
    out.write(key)
    writeUnsignedVInt(out, position)
    writeUnsignedVInt(out, promoted.length.toLong)
    if (promoted.nonEmpty) out.write(promoted)
  }

  final case class Entry(key: Array[Byte], position: Long)

  /** [[Entry]] plus the entry's own byte offset within Index.db — the
    * value a Summary.db summary entry points at. */
  final case class OffsetEntry(offset: Long, key: Array[Byte], position: Long)

  /** Canonical encoded size of an unsigned vint (Cassandra's formula —
    * both writers here emit canonical encodings). */
  def unsignedVIntSize(value: Long): Int = {
    val magnitude = java.lang.Long.numberOfLeadingZeros(value | 1L)
    (639 - magnitude * 9) >> 6
  }

  /** Entry count by pure SKIP-walk — no key copies, no Entry objects, no
    * per-entry allocation at all: the aggregate-pushdown kernel behind
    * the q156 count scan. (A production sstable would serve this number
    * from Stats/Summary metadata for free; the raw Index.db stream format
    * forces the walk, but nothing else.) */
  def countEntries(stream: InputStream): Long = {
    val in = new DataInputStream(
      new graft.sources.CountingBufferedInput(stream, 1 << 16))
    def skipFully(n: Long, what: String): Unit = {
      var left = n
      while (left > 0) {
        val s = in.skip(left)
        if (s <= 0) {
          if (in.read() < 0) throw new EOFException(s"truncated $what")
          left -= 1
        } else left -= s
      }
    }
    var n = 0L
    var done = false
    while (!done) {
      val first = in.read()
      if (first < 0) done = true
      else {
        val second = in.read()
        if (second < 0) throw new EOFException("truncated index key length")
        skipFully(((first << 8) | second).toLong, "index key")
        readUnsignedVInt(in) // position
        skipFully(readUnsignedVInt(in), "promoted index")
        n += 1
      }
    }
    n
  }

  /** Streaming entry iterator over a raw Index.db stream; skips the promoted
    * index exactly as the reference does. */
  def entries(stream: InputStream): Iterator[Entry] =
    entriesWithOffsets(stream).map(e => Entry(e.key, e.position))

  /** [[OffsetEntry]] plus the promoted (row) index bytes — empty when the
    * partition is not indexed. */
  final case class FullEntry(offset: Long, key: Array[Byte], position: Long,
      promoted: Array[Byte])

  /** [[entries]] additionally reporting each entry's byte offset within the
    * stream (consumed-byte accounting; encodings are canonical). Promoted
    * bytes are skipped, never copied (the split-planner path over
    * arbitrarily large files). */
  def entriesWithOffsets(stream: InputStream): Iterator[OffsetEntry] =
    fullEntries(stream, keepPromoted = false)
      .map(e => OffsetEntry(e.offset, e.key, e.position))

  /** Full entry iterator; `keepPromoted` copies the promoted-index bytes
    * out (the row-index consumers), otherwise skips them. */
  def fullEntries(stream: InputStream,
      keepPromoted: Boolean = true): Iterator[FullEntry] =
    new Iterator[FullEntry] {
      private val in = new DataInputStream(stream)
      private var consumed = 0L
      private var nextEntry: FullEntry = _
      private var done = false

      private def advance(): Unit = {
        val start = consumed
        val b0 = in.read()
        if (b0 < 0) { done = true; in.close(); return }
        val b1 = in.read()
        if (b1 < 0) throw new EOFException("truncated key length")
        val keyLen = (b0 << 8) | b1
        val key = new Array[Byte](keyLen)
        in.readFully(key)
        val position = readUnsignedVInt(in)
        val promotedLen = readUnsignedVInt(in)
        // cap far above any real promoted index (those are ~KBs; 256 MiB
        // here) so a corrupt vint can't demand a GiB-scale allocation
        // before the read fails
        if (promotedLen < 0 || promotedLen > (1L << 28))
          throw new java.io.IOException(
            s"corrupt promoted-index length $promotedLen")
        val promoted =
          if (keepPromoted && promotedLen > 0) {
            val b = new Array[Byte](promotedLen.toInt)
            in.readFully(b)
            b
          } else {
            // skipBytes may skip fewer bytes than asked; a silent partial
            // skip on a truncated file would end iteration cleanly instead
            // of failing like the truncated-key path does
            var remaining = promotedLen.toInt
            while (remaining > 0) {
              val skipped = in.skipBytes(remaining)
              if (skipped <= 0)
                throw new EOFException("truncated promoted index")
              remaining -= skipped
            }
            Array.emptyByteArray
          }
        consumed = start + 2L + keyLen + unsignedVIntSize(position) +
          unsignedVIntSize(promotedLen) + promotedLen
        nextEntry = FullEntry(start, key, position, promoted)
      }

      override def hasNext: Boolean = {
        if (!done && nextEntry == null) advance()
        !done
      }
      override def next(): FullEntry = {
        if (!hasNext) throw new NoSuchElementException
        val e = nextEntry; nextEntry = null; e
      }
    }
}
