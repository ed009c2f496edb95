package graft.sources.summarydb

import java.io.{DataInputStream, DataOutput}

/** REAL Cassandra big-format Summary.db (the downsampled partition-index
  * summary Cassandra mmaps to bound Index.db binary searches).
  *
  * Layout per Cassandra's `IndexSummary.IndexSummarySerializer` plus the
  * first/last-key tail `SSTableReader.saveSummary` appends:
  *
  * {{{
  * be32  minIndexInterval
  * be32  offsetCount                  // number of summary entries
  * be64  offheapSize                  // bytes of the offsets+entries block
  * be32  samplingLevel                // 128 = BASE_SAMPLING_LEVEL (full)
  * be32  sizeAtFullSampling
  * le32  offsets[offsetCount]         // entry start, relative to entries[0]
  * entry { key bytes; le64 position } // key length implied by next offset
  * be32-length-prefixed firstKey
  * be32-length-prefixed lastKey
  * }}}
  *
  * The header ints are big-endian (`DataOutput`), but the offsets and entry
  * positions are LITTLE-endian: Cassandra serializes its off-heap `Memory`
  * regions raw, and `Memory.setInt/setLong` write native order — a
  * documented quirk of this component (the only LE fields in the sstable
  * set). Entry i's key spans offsets[i]..offsets[i+1]-8 (the last entry
  * runs to the end of the entries region); its position is the Index.db
  * byte offset of the sampled partition's index entry.
  *
  * Reference behavior: the reference reads summaries implicitly through
  * the embedded Cassandra library when it opens sstables
  * (`ColumnFamilyBackend.java:92-132` rebuilds readers which load/save
  * Summary.db); this module makes the component itself a first-class
  * relation.
  */
object SummaryDbFormat {

  val Suffix = "-Summary.db"

  /** Cassandra's BASE_SAMPLING_LEVEL: summaries written at full sampling. */
  val BaseSamplingLevel = 128

  final case class Entry(key: Array[Byte], position: Long)

  final case class Summary(
      minIndexInterval: Int,
      samplingLevel: Int,
      sizeAtFullSampling: Int,
      entries: IndexedSeq[Entry],
      firstKey: Array[Byte],
      lastKey: Array[Byte])

  def write(out: DataOutput, s: Summary): Unit = {
    val n = s.entries.length
    val entriesBytes = s.entries.map(e => e.key.length + 8L).sum
    out.writeInt(s.minIndexInterval)
    out.writeInt(n)
    out.writeLong(4L * n + entriesBytes)
    out.writeInt(s.samplingLevel)
    out.writeInt(s.sizeAtFullSampling)
    var off = 0L
    s.entries.foreach { e =>
      out.writeInt(Integer.reverseBytes(off.toInt)) // le32
      off += e.key.length + 8L
    }
    s.entries.foreach { e =>
      out.write(e.key)
      out.writeLong(java.lang.Long.reverseBytes(e.position)) // le64
    }
    out.writeInt(s.firstKey.length)
    out.write(s.firstKey)
    out.writeInt(s.lastKey.length)
    out.write(s.lastKey)
  }

  /** Fail-closed parse: a hostile or corrupted header (implausible entry
    * count, an `offheapSize` demanding a GB-scale allocation from a tiny
    * file, non-monotone offsets) throws [[java.io.IOException]] BEFORE
    * any large allocation — the component is reachable from arbitrary
    * files through the `sstable-summary` DSv2, so the codec must never
    * OOM on bad bytes. */
  def parse(in: DataInputStream): Summary = {
    def bad(msg: String): Nothing = throw new java.io.IOException(
      s"corrupt Summary.db: $msg")
    val minIndexInterval = in.readInt()
    if (minIndexInterval <= 0)
      bad(s"implausible minIndexInterval $minIndexInterval")
    val n = in.readInt()
    if (n < 0 || n > (1 << 28)) bad(s"implausible entry count $n")
    val offheapSize = in.readLong()
    // every entry is ≥ 8 bytes (its position) after the 4-byte offset;
    // an empty summary's region is empty — a nonzero size there would
    // demand an arbitrary allocation backed by nothing
    if (offheapSize < 12L * n || offheapSize > (1L << 31) ||
        (n == 0 && offheapSize != 0L))
      bad(s"implausible offheapSize $offheapSize for $n entries")
    val samplingLevel = in.readInt()
    if (samplingLevel <= 0) bad(s"implausible samplingLevel $samplingLevel")
    val sizeAtFullSampling = in.readInt()
    val offsets = Array.fill(n)(Integer.reverseBytes(in.readInt()).toLong)
    val entriesLen = offheapSize - 4L * n
    var i = 0
    while (i < n) {
      val end = if (i + 1 < n) offsets(i + 1) else entriesLen
      if (offsets(i) < 0 || end - offsets(i) < 8 || end > entriesLen)
        bad(s"offset table not monotone at entry $i " +
          s"(${offsets(i)} .. $end of $entriesLen)")
      i += 1
    }
    // read the claimed region in bounded chunks (round 19, fuzz-driven
    // hardening): allocation stays proportional to bytes ACTUALLY
    // present — a flipped offheapSize in a small file hits EOF after at
    // most one chunk instead of demanding the full claimed allocation
    // up front
    val region = {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      var remaining = entriesLen
      while (remaining > 0) {
        val r = in.read(buf, 0,
          math.min(buf.length.toLong, remaining).toInt)
        if (r < 0) bad(s"entries region truncated " +
          s"($remaining of $entriesLen bytes missing)")
        bos.write(buf, 0, r)
        remaining -= r
      }
      bos.toByteArray
    }
    val entries = (0 until n).map { i =>
      val start = offsets(i)
      val end = if (i + 1 < n) offsets(i + 1) else entriesLen
      val key = java.util.Arrays.copyOfRange(region, start.toInt,
        (end - 8L).toInt)
      val bb = java.nio.ByteBuffer.wrap(region, (end - 8L).toInt, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Entry(key, bb.getLong)
    }
    def keyWithLength(): Array[Byte] = {
      val len = in.readInt()
      if (len < 0 || len > (1 << 20)) bad(s"implausible tail key length $len")
      val k = new Array[Byte](len)
      in.readFully(k)
      k
    }
    Summary(minIndexInterval, samplingLevel, sizeAtFullSampling, entries,
      keyWithLength(), keyWithLength())
  }
}
