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
  * Row-index trie payloads use the plain unsigned codec: `flags = w`,
  * payload = `w`-byte big-endian block offset (payload length == flags,
  * the invariant the shared walker bounds-checks). */
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

    /** One indexed partition: `blocks` = (separator key, block offset)
      * pairs (offsets ascending from 0), `dataPos` = the partition's
      * Data.db start. Returns this partition's entry offset. */
    def append(blocks: Seq[(Array[Byte], Long)], dataPos: Long): Long = {
      require(blocks.nonEmpty, "row index entry with no blocks")
      val payloaded = blocks.iterator.map { case (sep, off) =>
        require(off >= 0, s"negative block offset $off")
        val w = math.max(1,
          (71 - java.lang.Long.numberOfLeadingZeros(off)) / 8)
        val p = new Array[Byte](w)
        var i = 0
        while (i < w) {
          p(i) = ((off >>> ((w - 1 - i) * 8)) & 0xff).toByte
          i += 1
        }
        (sep, w, p)
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

  /** The blocks of one entry: (separator key, block offset) in separator
    * order. The entry's trie is bounded by its own entry record. */
  def blocks(bytes: Array[Byte], entryOffset: Long)
      : Iterator[(Array[Byte], Long)] = {
    val e = readEntry(bytes, entryOffset)
    if (e.root < 0 || e.root >= entryOffset)
      throw new java.io.IOException(
        s"bti Rows.db root ${e.root} outside its entry")
    BtiTrieFormat.scanTrie(bytes, e.root, entryOffset.toInt)
      .map { case (sep, flags, at) => (sep, be(bytes, at, flags)) }
  }
}
