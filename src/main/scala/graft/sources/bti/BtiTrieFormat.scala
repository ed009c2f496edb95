package graft.sources.bti

import scala.collection.mutable.ArrayBuffer

/** The `bti` (trie-indexed, Cassandra 5 "da") Partitions.db beachhead —
  * the FULL-SCAN access path: walk every payload node of the partition
  * trie in key order and enumerate (key, Data.db position), which is all
  * the `pstats` pipeline needs (partition sizes fall out of consecutive
  * position deltas exactly as with big-format Index.db). The reference
  * reads bti transparently through its embedded cassandra-all
  * (reference pom.xml:88-94); this engine previously could not read a
  * bti node at all.
  *
  * Structure follows the published design of Cassandra's
  * `org.apache.cassandra.io.tries` (TrieNode.java / BtiFormat.md;
  * CEP-25): a serialized trie whose nodes are written children-first
  * (pointers always point BACKWARD, stored as `nodePos − childPos`
  * distances so near children use narrow widths), each node leading with
  * one byte of `(type nibble << 4) | payload nibble`, transitions sorted
  * ascending so a depth-first walk enumerates keys in lexicographic
  * (byte-comparable) order, and the file tail carrying the partition
  * count and root offset.
  *
  * Beachhead subset, stated honestly:
  *  - node types implemented: PAYLOAD_ONLY, SINGLE_8, SINGLE_16,
  *    SPARSE_16, SPARSE_40, DENSE_16, DENSE_40 — the writer here never
  *    needs the 4/12/24/32-bit pointer-width variants or LONG_DENSE, and
  *    the reader rejects them loudly rather than misparse;
  *  - the payload nibble is the byte-width of the position (SizedInts
  *    style, big-endian), 0 = no payload — the row-index flag bit and
  *    key-filter hash byte of the real partition payload are not modeled
  *    (this engine's pstats path only consumes data positions);
  *  - like every codec in this repo, written from the published design
  *    with no live-node files available to cross-validate byte-exactness.
  */
object BtiTrieFormat {

  val Suffix = "-Partitions.db"

  /** Published TrieNode ordinal space (high nibble of the node byte). */
  val TypePayloadOnly = 0
  val TypeSingle8 = 2
  val TypeSingle16 = 4
  val TypeSparse16 = 7
  val TypeSparse40 = 9
  val TypeDense16 = 11
  val TypeDense40 = 14

  private final class Node {
    val children = new java.util.TreeMap[Integer, Node]()
    var payload: Long = -1L // -1 = none; Data.db positions are >= 0
    var offset: Long = -1L
  }

  /** Serialize a partition trie from (key bytes, position) entries.
    * Entries need not be pre-sorted — the trie sorts. Keys must be unique
    * and non-empty (partition keys are). Output layout:
    * `node* keyCount:int64_be rootOffset:int64_be`. */
  def write(entries: Iterator[(Array[Byte], Long)]): Array[Byte] = {
    val root = new Node
    var count = 0L
    entries.foreach { case (key, pos) =>
      require(key.nonEmpty, "empty partition key")
      require(pos >= 0, s"negative position $pos")
      var n = root
      key.foreach { b =>
        n = n.children.computeIfAbsent(b & 0xff, _ => new Node)
      }
      require(n.payload < 0, "duplicate partition key")
      n.payload = pos
      count += 1
    }
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def wbe(v: Long, bytes: Int): Unit = {
      var i = (bytes - 1) * 8
      while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
    }
    def payloadWidth(p: Long): Int =
      math.max(1, (71 - java.lang.Long.numberOfLeadingZeros(p)) / 8)
    // children-first: by the time a node serializes, every child offset is
    // known and strictly smaller, so distances are positive
    def serialize(n: Node): Unit = {
      n.children.values().forEach(c => serialize(c))
      n.offset = out.size().toLong
      val flags = if (n.payload >= 0) payloadWidth(n.payload) else 0
      val kids = n.children
      import scala.jdk.CollectionConverters._
      val dists = kids.values().asScala.map(c => n.offset - c.offset)
      val maxDist = if (dists.isEmpty) 0L else dists.max
      if (kids.isEmpty) {
        out.write((TypePayloadOnly << 4) | flags)
      } else if (kids.size == 1 && maxDist <= 0xffL) {
        out.write((TypeSingle8 << 4) | flags)
        out.write(kids.firstKey.intValue)
        wbe(n.offset - kids.firstEntry.getValue.offset, 1)
      } else if (kids.size == 1 && maxDist <= 0xffffL) {
        out.write((TypeSingle16 << 4) | flags)
        out.write(kids.firstKey.intValue)
        wbe(n.offset - kids.firstEntry.getValue.offset, 2)
      } else {
        // dense iff the transition range is at least half-populated
        val first = kids.firstKey.intValue
        val last = kids.lastKey.intValue
        val range = last - first + 1
        val dense = range <= 2 * kids.size
        val wide = maxDist > 0xffffL
        val width = if (wide) 5 else 2
        if (dense) {
          out.write(((if (wide) TypeDense40 else TypeDense16) << 4) | flags)
          out.write(first)
          out.write(range - 1) // range ∈ [1, 256] encoded as range−1
          var t = first
          while (t <= last) {
            val c = kids.get(t)
            if (c == null) wbe(0L, width) // 0 distance = no child
            else wbe(n.offset - c.offset, width)
            t += 1
          }
        } else {
          require(kids.size <= 255, s"fanout ${kids.size} needs DENSE")
          out.write(((if (wide) TypeSparse40 else TypeSparse16) << 4) | flags)
          out.write(kids.size)
          kids.keySet().forEach(t => out.write(t.intValue))
          kids.entrySet().forEach { e =>
            wbe(n.offset - e.getValue.offset, width)
          }
        }
      }
      if (flags > 0) wbe(n.payload, flags)
    }
    serialize(root)
    wbe(count, 8)
    wbe(root.offset, 8)
    out.toByteArray
  }

  private def be(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Partition count from the file tail (the cheap `estimatedKeys`). */
  def keyCount(bytes: Array[Byte]): Long = {
    if (bytes.length < 17)
      throw new java.io.IOException("bti Partitions.db too short")
    be(bytes, bytes.length - 16, 8)
  }

  /** Lookup-free full scan: depth-first walk from the root, children in
    * ascending transition order, reconstructing each key from the path —
    * keys stream out in lexicographic order. Eager per file (the whole
    * partition index is already in memory; entries are key+8 bytes). */
  def fullScan(bytes: Array[Byte]): Iterator[(Array[Byte], Long)] = {
    if (bytes.length < 17)
      throw new java.io.IOException("bti Partitions.db too short")
    val root = be(bytes, bytes.length - 8, 8)
    val limit = bytes.length - 16
    if (root < 0 || root >= limit)
      throw new java.io.IOException(s"bti root offset $root out of range")
    val acc = ArrayBuffer.empty[(Array[Byte], Long)]
    val prefix = ArrayBuffer.empty[Byte]
    def walk(offL: Long): Unit = {
      if (offL < 0 || offL >= limit)
        throw new java.io.IOException(s"bti node offset $offL out of range")
      val off = offL.toInt
      val head = bytes(off) & 0xff
      val tpe = head >>> 4
      val flags = head & 0x0f
      // (transition, childOffset) pairs in ascending transition order
      var children: List[(Int, Long)] = Nil
      var payloadAt = off + 1
      tpe match {
        case TypePayloadOnly => ()
        case TypeSingle8 | TypeSingle16 =>
          val w = if (tpe == TypeSingle8) 1 else 2
          val t = bytes(off + 1) & 0xff
          val d = be(bytes, off + 2, w)
          children = List((t, offL - d))
          payloadAt = off + 2 + w
        case TypeSparse16 | TypeSparse40 =>
          val w = if (tpe == TypeSparse16) 2 else 5
          val n = bytes(off + 1) & 0xff
          val b = List.newBuilder[(Int, Long)]
          var i = 0
          while (i < n) {
            val t = bytes(off + 2 + i) & 0xff
            val d = be(bytes, off + 2 + n + i * w, w)
            b += ((t, offL - d))
            i += 1
          }
          children = b.result()
          payloadAt = off + 2 + n + n * w
        case TypeDense16 | TypeDense40 =>
          val w = if (tpe == TypeDense16) 2 else 5
          val first = bytes(off + 1) & 0xff
          val range = (bytes(off + 2) & 0xff) + 1
          val b = List.newBuilder[(Int, Long)]
          var i = 0
          while (i < range) {
            val d = be(bytes, off + 3 + i * w, w)
            if (d != 0) b += ((first + i, offL - d))
            i += 1
          }
          children = b.result()
          payloadAt = off + 3 + range * w
        case other =>
          throw new java.io.IOException(
            s"bti node type $other not in this reader's subset")
      }
      if (flags > 0) {
        if (payloadAt + flags > limit)
          throw new java.io.IOException("bti payload overruns trie")
        acc += ((prefix.toArray, be(bytes, payloadAt, flags)))
      }
      children.foreach { case (t, c) =>
        prefix += t.toByte
        walk(c)
        prefix.remove(prefix.length - 1)
      }
    }
    walk(root)
    acc.iterator
  }
}
