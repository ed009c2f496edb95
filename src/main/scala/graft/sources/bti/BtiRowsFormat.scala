package graft.sources.bti

/** The bti family's Rows.db (row index) codec — the per-partition
  * clustering-separator tries that large partitions' Partitions.db
  * payloads point at (as `~entryOffset`, [[BtiTrieFormat]]). Models the
  * published BtiFormat.md / RowIndexReader design: for each indexed
  * partition a trie keyed by byte-comparable clustering separators whose
  * payloads are block offsets WITHIN the partition's Data.db slice, plus a
  * per-partition entry record the partition index references. The
  * reference reads this structure through its embedded cassandra-all
  * (reference pom.xml:88-94).
  *
  * Modeled file layout (the trie NODE encoding is the published one;
  * the entry-record framing is this engine's, documented here because no
  * live-node files are available in-sandbox to cross-validate):
  *
  * per indexed partition, appended in partition order:
  *   `trieNodes*` then at `entryOffset`:
  *   `rootOffset:int64_be dataPos:int64_be blockCount:int32_be`
  * file tail: `entryCount:int64_be`.
  *
  * Row-index trie payloads (payload length == flags nibble, the invariant
  * the shared walker bounds-checks):
  *  - `flags = w` (1..8): `w`-byte big-endian block offset, no open
  *    marker — the block starts outside any range tombstone.
  *  - `flags = w + 12` (13..15): `w`-byte offset followed by the OPEN
  *    MARKER deletion time the block starts under (BtiFormat.md's
  *    RowIndexReader payload carries the same optional DeletionTime):
  *    `markedForDeleteAt_us:int64_be localDeletionTime_s:uint32_be`.
  *    The 4-bit flags nibble caps `w` at 3 for marker payloads (block
  *    offsets < 2^24 within a marker-carrying partition) — a modeled
  *    bound; the real format's vint payloads have no such limit.
  *  - `flags` 9..12 are invalid and rejected by the reader. */
object BtiRowsFormat {

  val Suffix = "-Rows.db"

  /** Appends per-partition row-index entries into one growing stream;
    * `append` returns the entry offset to store (complemented) in the
    * partition index. */
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream(1 << 16)
    private var entries = 0L

    private def wbe(v: Long, bytes: Int): Unit = {
      var i = (bytes - 1) * 8
      while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
    }

    /** One indexed partition: `blocks` = (separator key, block offset,
      * optional open-marker deletion time `(markedForDeleteAt_us,
      * localDeletionTime_s)`) triples (offsets ascending from 0),
      * `dataPos` = the partition's Data.db start. Returns this partition's
      * entry offset. */
    def append(blocks: Seq[(Array[Byte], Long, Option[(Long, Long)])],
        dataPos: Long): Long = {
      require(blocks.nonEmpty, "row index entry with no blocks")
      val payloaded = blocks.iterator.map { case (sep, off, marker) =>
        require(off >= 0, s"negative block offset $off")
        val w = math.max(1,
          (71 - java.lang.Long.numberOfLeadingZeros(off)) / 8)
        def offBytes(into: Array[Byte]): Unit = {
          var i = 0
          while (i < w) {
            into(i) = ((off >>> ((w - 1 - i) * 8)) & 0xff).toByte
            i += 1
          }
        }
        marker match {
          case None =>
            val p = new Array[Byte](w)
            offBytes(p)
            (sep, w, p)
          case Some((mdUs, ldtS)) =>
            require(w <= 3,
              s"block offset $off too wide for a marker payload (w=$w > 3)")
            require(mdUs >= 0 && ldtS >= 0 && ldtS <= 0xffffffffL,
              s"open-marker deletion time out of range ($mdUs, $ldtS)")
            val p = new Array[Byte](w + 12)
            offBytes(p)
            var i = 0
            while (i < 8) {
              p(w + i) = ((mdUs >>> ((7 - i) * 8)) & 0xff).toByte
              i += 1
            }
            i = 0
            while (i < 4) {
              p(w + 8 + i) = ((ldtS >>> ((3 - i) * 8)) & 0xff).toByte
              i += 1
            }
            (sep, w + 12, p)
        }
      }
      val root = BtiTrieFormat.writeTrie(out, payloaded)
      val entryOffset = out.size().toLong
      wbe(root, 8)
      wbe(dataPos, 8)
      wbe(blocks.length.toLong, 4)
      entries += 1
      entryOffset
    }

    def finish(): Array[Byte] = {
      wbe(entries, 8)
      out.toByteArray
    }
  }

  private def be(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  final case class Entry(root: Long, dataPos: Long, blockCount: Int)

  /** Entry record at `entryOffset` (what a partition-index `~pos` names). */
  def readEntry(bytes: Array[Byte], entryOffset: Long): Entry = {
    if (entryOffset < 0 || entryOffset + 20 > bytes.length - 8)
      throw new java.io.IOException(
        s"bti Rows.db entry offset $entryOffset out of range")
    val off = entryOffset.toInt
    Entry(be(bytes, off, 8), be(bytes, off + 8, 8),
      be(bytes, off + 16, 4).toInt)
  }

  /** Total indexed-partition count from the file tail. */
  def entryCount(bytes: Array[Byte]): Long = {
    if (bytes.length < 8)
      throw new java.io.IOException("bti Rows.db too short")
    be(bytes, bytes.length - 8, 8)
  }

  /** The blocks of one entry: (separator key, block offset, optional
    * open-marker deletion time) in separator order. The entry's trie is
    * bounded by its own entry record. */
  def blocks(bytes: Array[Byte], entryOffset: Long)
      : Iterator[(Array[Byte], Long, Option[(Long, Long)])] = {
    val e = readEntry(bytes, entryOffset)
    if (e.root < 0 || e.root >= entryOffset)
      throw new java.io.IOException(
        s"bti Rows.db root ${e.root} outside its entry")
    BtiTrieFormat.scanTrie(bytes, e.root, entryOffset.toInt)
      .map { case (sep, flags, at) =>
        if (flags <= 8) (sep, be(bytes, at, flags), None)
        else if (flags >= 13) {
          val w = flags - 12
          (sep, be(bytes, at, w),
            Some((be(bytes, at + w, 8), be(bytes, at + w + 8, 4))))
        } else throw new java.io.IOException(
          s"bti Rows.db invalid payload flags $flags")
      }
  }
}
