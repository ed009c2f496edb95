package graft.sources.bti

import scala.collection.mutable.ArrayBuffer

/** The `bti` (trie-indexed, Cassandra 5 "da") index trie codec — now the
  * FULL node-type surface of the published design plus both access paths:
  * the key-ordered full scan and the per-key point lookup. The reference
  * reads bti transparently through its embedded cassandra-all (reference
  * pom.xml:88-94); this engine reads it with its own codec.
  *
  * Structure follows the published design of Cassandra's
  * `org.apache.cassandra.io.tries` (TrieNode.java / BtiFormat.md;
  * CEP-25): a serialized trie whose nodes are written children-first
  * (pointers always point BACKWARD, stored as `nodePos − childPos`
  * distances so near children use narrow widths), each node leading with
  * one byte of `(type nibble << 4) | payload nibble`, transitions sorted
  * ascending so a depth-first walk enumerates keys in lexicographic
  * (byte-comparable) order.
  *
  * All 16 published node ordinals are implemented in reader AND writer:
  * PAYLOAD_ONLY, SINGLE_NOPAYLOAD_4/8/NOPAYLOAD_12/16,
  * SPARSE_8/12/16/24/40, DENSE_12/16/24/32/40 and LONG_DENSE (64-bit
  * pointers). 12-bit pointers pack two-per-three-bytes; the NOPAYLOAD
  * singles carry their pointer's high nibble in the head byte's low
  * nibble. The traversals are ITERATIVE (explicit stack), so 64 KiB
  * partition keys cannot overflow the JVM stack, and every node body,
  * pointer distance (`d > 0` — pointers are strictly backward, which also
  * makes cycles structurally impossible) and payload extent is
  * bounds-checked with a typed IOException.
  *
  * Payload model (the partition-index payload of BtiFormat.md):
  * `flags = 1 + w` where the payload is one KEY-HASH byte (a lookup
  * false-positive filter) followed by a `w`-byte signed big-endian
  * position; a position `p >= 0` is a direct Data.db offset, `p < 0`
  * means `~p` is the offset of this partition's row-index entry in
  * Rows.db ([[BtiRowsFormat]]). Row-index tries use the plain unsigned
  * payload (`flags = w`). In both codecs the payload LENGTH equals the
  * flags nibble, which is what the core walker bounds-checks. The hash
  * byte is Cassandra's own short-hash (murmur3-x64-128 low byte of
  * hash[1], `DecoratedKey.filterHashLowerBits()` in the published source
  * — see [[hashByte]]); like every codec in this repo the layout is
  * written from the published design with no live-node files available to
  * cross-validate byte-exactness (the trie node encoding follows
  * TrieNode.java).
  *
  * File layout of a Partitions.db written here:
  * `node* keyCount:int64_be rootOffset:int64_be`.
  */
object BtiTrieFormat {

  val Suffix = "-Partitions.db"

  /** Published TrieNode ordinal space (high nibble of the node byte). */
  val TypePayloadOnly = 0
  val TypeSingleNoPayload4 = 1
  val TypeSingle8 = 2
  val TypeSingleNoPayload12 = 3
  val TypeSingle16 = 4
  val TypeSparse8 = 5
  val TypeSparse12 = 6
  val TypeSparse16 = 7
  val TypeSparse24 = 8
  val TypeSparse40 = 9
  val TypeDense12 = 10
  val TypeDense16 = 11
  val TypeDense24 = 12
  val TypeDense32 = 13
  val TypeDense40 = 14
  val TypeLongDense = 15

  /** Key-hash byte stored ahead of each partition payload (lookup
    * false-positive filter): Cassandra's own short-hash. The published
    * source computes it as `DecoratedKey.filterHashLowerBits()` — the low
    * bits of `hash[1]` of `MurmurHash.hash3_x64_128(key, seed=0)`, the
    * SAME hash family Filter.db keys pass through — and the bti partition
    * index stores its low byte with each payload. Reuses the
    * [[graft.sources.filterdb.Murmur3Cassandra]] implementation already
    * proven against the bloom layout (replaces the round-≤9 FNV-1a
    * stand-in; no live-node files exist in this environment to
    * cross-validate the byte, but the function is now Cassandra's own
    * rather than a modeled fold). */
  def hashByte(key: Array[Byte]): Byte =
    (graft.sources.filterdb.Murmur3Cassandra
      .hash3x64128(key, 0L)(1) & 0xff).toByte

  /** Bytes of a signed big-endian encoding that round-trips `v`. */
  def signedWidth(v: Long): Int = {
    var w = 1
    while (w < 8 &&
        !(v >= -(1L << (8 * w - 1)) && v < (1L << (8 * w - 1)))) w += 1
    w
  }

  // ---------------------------------------------------------------------
  // generic writer
  // ---------------------------------------------------------------------

  private final class Node {
    val children = new java.util.TreeMap[Integer, Node]()
    var flags: Int = 0 // payload nibble; 0 = none
    var payload: Array[Byte] = null
    var offset: Long = -1L
  }

  /** Append one serialized trie to `out` from (key, payloadFlags,
    * payloadBytes) entries and return the ROOT offset within the stream.
    * `payloadBytes.length` must equal `payloadFlags` (1..15; the walker
    * bounds-checks payloads by the flags nibble). Keys must be unique and
    * non-empty. `widthFloorBits` forces every multi-child pointer width up
    * to at least that many bits (0 = narrowest fit) — it exists so tests
    * can exercise the 24/32/40/64-bit reader paths without terabyte
    * files. */
  def writeTrie(out: java.io.ByteArrayOutputStream,
      entries: Iterator[(Array[Byte], Int, Array[Byte])],
      widthFloorBits: Int = 0): Long = {
    val root = new Node
    entries.foreach { case (key, flags, payload) =>
      require(key.nonEmpty, "empty trie key")
      require(flags > 0 && flags <= 15, s"payload flags $flags out of range")
      require(payload.length == flags,
        s"payload length ${payload.length} != flags $flags")
      var n = root
      key.foreach { b =>
        n = n.children.computeIfAbsent(b & 0xff, _ => new Node)
      }
      require(n.flags == 0, "duplicate trie key")
      n.flags = flags
      n.payload = payload
    }

    def wbe(v: Long, bytes: Int): Unit = {
      var i = (bytes - 1) * 8
      while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
    }
    // 12-bit pointers pack two-per-three-bytes, high nibble first
    def w12(vals: Seq[Long]): Unit = {
      var i = 0
      while (i < vals.length) {
        if (i + 1 < vals.length) {
          val a = vals(i); val b = vals(i + 1)
          out.write(((a >>> 4) & 0xff).toInt)
          out.write((((a & 0xf) << 4) | ((b >>> 8) & 0xf)).toInt)
          out.write((b & 0xff).toInt)
          i += 2
        } else {
          val a = vals(i)
          out.write(((a >>> 4) & 0xff).toInt)
          out.write(((a & 0xf) << 4).toInt)
          i += 1
        }
      }
    }

    // children-first post-order WITHOUT recursion: a 64 KiB key is a
    // 64k-deep chain, far past the JVM stack
    val emitStack = new java.util.ArrayDeque[(Node, java.util.Iterator[Node])]()
    def emit(n: Node): Unit = {
      import scala.jdk.CollectionConverters._
      n.offset = out.size().toLong
      val kids = n.children
      val dists = kids.values().asScala.map(c => n.offset - c.offset).toSeq
      val maxDist = if (dists.isEmpty) 0L else dists.max
      val flags = n.flags
      if (kids.isEmpty) {
        out.write((TypePayloadOnly << 4) | flags)
      } else if (kids.size == 1) {
        val t = kids.firstKey.intValue
        val d = maxDist
        if (flags == 0 && d <= 0xfL && widthFloorBits <= 4) {
          out.write((TypeSingleNoPayload4 << 4) | d.toInt)
          out.write(t)
        } else if (d <= 0xffL && widthFloorBits <= 8) {
          out.write((TypeSingle8 << 4) | flags)
          out.write(t)
          wbe(d, 1)
        } else if (flags == 0 && d <= 0xfffL && widthFloorBits <= 12) {
          out.write((TypeSingleNoPayload12 << 4) | ((d >>> 8) & 0xf).toInt)
          out.write(t)
          wbe(d & 0xff, 1)
        } else if (d <= 0xffffL && widthFloorBits <= 16) {
          out.write((TypeSingle16 << 4) | flags)
          out.write(t)
          wbe(d, 2)
        } else {
          sparseOrDense(n, dists, maxDist, flags)
        }
      } else {
        sparseOrDense(n, dists, maxDist, flags)
      }
      if (flags > 0) out.write(n.payload, 0, n.payload.length)
    }
    def sparseOrDense(n: Node, dists: Seq[Long], maxDist: Long,
        flags: Int): Unit = {
      val kids = n.children
      val first = kids.firstKey.intValue
      val last = kids.lastKey.intValue
      val range = last - first + 1
      // dense iff the transition range is at least half-populated (or the
      // sparse count byte cannot hold the fanout)
      val dense = range <= 2 * kids.size || kids.size > 255
      def atLeast(bits: Int): Int = math.max(bits, widthFloorBits)
      if (dense) {
        val (tpe, w) =
          if (maxDist <= 0xfffL && atLeast(12) == 12) (TypeDense12, 12)
          else if (maxDist <= 0xffffL && atLeast(16) <= 16) (TypeDense16, 16)
          else if (maxDist <= 0xffffffL && atLeast(24) <= 24) (TypeDense24, 24)
          else if (maxDist <= 0xffffffffL && atLeast(32) <= 32)
            (TypeDense32, 32)
          else if (maxDist <= 0xffffffffffL && atLeast(40) <= 40)
            (TypeDense40, 40)
          else (TypeLongDense, 64)
        out.write((tpe << 4) | flags)
        out.write(first)
        out.write(range - 1) // range ∈ [1, 256] encoded as range−1
        val vals = (first to last).map { t =>
          val c = kids.get(t)
          if (c == null) 0L else n.offset - c.offset // 0 = no child
        }
        if (w == 12) w12(vals) else vals.foreach(v => wbe(v, w / 8))
      } else {
        val (tpe, w) =
          if (maxDist <= 0xffL && atLeast(8) == 8) (TypeSparse8, 8)
          else if (maxDist <= 0xfffL && atLeast(12) <= 12) (TypeSparse12, 12)
          else if (maxDist <= 0xffffL && atLeast(16) <= 16) (TypeSparse16, 16)
          else if (maxDist <= 0xffffffL && atLeast(24) <= 24)
            (TypeSparse24, 24)
          else (TypeSparse40, 40)
        out.write((tpe << 4) | flags)
        out.write(kids.size)
        kids.keySet().forEach(t => out.write(t.intValue))
        val vals = {
          import scala.jdk.CollectionConverters._
          kids.values().asScala.map(c => n.offset - c.offset).toSeq
        }
        if (w == 12) w12(vals) else vals.foreach(v => wbe(v, w / 8))
      }
    }
    // iterative post-order: push a frame per node, emit when children done
    emitStack.push((root, root.children.values().iterator()))
    while (!emitStack.isEmpty) {
      val (n, it) = emitStack.peek()
      if (it.hasNext) {
        val c = it.next()
        emitStack.push((c, c.children.values().iterator()))
      } else {
        emitStack.pop()
        emit(n)
      }
    }
    root.offset
  }

  /** Serialize a PARTITION trie from (key bytes, position) entries with
    * the partition payload (hash byte + signed position; `pos < 0` means
    * `~pos` is a Rows.db entry offset). Entries need not be pre-sorted.
    * Output: `node* keyCount:int64_be rootOffset:int64_be`. */
  def write(entries: Iterator[(Array[Byte], Long)],
      widthFloorBits: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    var count = 0L
    val payloaded = entries.map { case (key, pos) =>
      count += 1
      val w = signedWidth(pos)
      val p = new Array[Byte](1 + w)
      p(0) = hashByte(key)
      var i = 0
      while (i < w) { p(1 + i) = ((pos >>> ((w - 1 - i) * 8)) & 0xff).toByte; i += 1 }
      (key, 1 + w, p)
    }
    val root = writeTrie(out, payloaded, widthFloorBits)
    def wbe(v: Long, bytes: Int): Unit = {
      var i = (bytes - 1) * 8
      while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
    }
    wbe(count, 8)
    wbe(root, 8)
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // generic reader
  // ---------------------------------------------------------------------

  private def be(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def beSigned(b: Array[Byte], off: Int, len: Int): Long = {
    val v = be(b, off, len)
    val shift = 64 - 8 * len
    (v << shift) >> shift
  }

  /** Parsed node: transitions ascending, child offsets absolute, payload
    * start, payload flags nibble. Every offset/extent is validated. */
  private final case class ParsedNode(transitions: Array[Int],
      childOffsets: Array[Long], flags: Int, payloadAt: Int)

  private def fail(msg: String): Nothing = throw new java.io.IOException(msg)

  /** 12-bit pointer i of a packed run starting at `base`. */
  private def r12(b: Array[Byte], base: Int, i: Int): Long = {
    val o = base + (i * 3) / 2
    if (i % 2 == 0) (((b(o) & 0xffL) << 4) | ((b(o + 1) & 0xf0L) >>> 4))
    else (((b(o) & 0x0fL) << 8) | (b(o + 1) & 0xffL))
  }

  private def parseNode(bytes: Array[Byte], offL: Long,
      limit: Int): ParsedNode = {
    if (offL < 0 || offL >= limit) fail(s"bti node offset $offL out of range")
    val off = offL.toInt
    val head = bytes(off) & 0xff
    val tpe = head >>> 4
    val low = head & 0x0f
    // (bodyEnd, flags) per type; body extent checked BEFORE any body read
    def need(extent: Int): Unit =
      if (extent > limit) fail("bti node body overruns trie")
    def child(d: Long): Long = {
      if (d <= 0) fail(s"bti pointer distance $d not strictly backward")
      val c = offL - d
      if (c < 0) fail(s"bti child offset $c out of range")
      c
    }
    tpe match {
      case TypePayloadOnly =>
        ParsedNode(Array.empty, Array.empty, low, off + 1)
      case TypeSingleNoPayload4 =>
        need(off + 2)
        ParsedNode(Array(bytes(off + 1) & 0xff), Array(child(low.toLong)),
          0, off + 2)
      case TypeSingle8 =>
        need(off + 3)
        ParsedNode(Array(bytes(off + 1) & 0xff),
          Array(child(be(bytes, off + 2, 1))), low, off + 3)
      case TypeSingleNoPayload12 =>
        need(off + 3)
        ParsedNode(Array(bytes(off + 1) & 0xff),
          Array(child((low.toLong << 8) | (bytes(off + 2) & 0xffL))),
          0, off + 3)
      case TypeSingle16 =>
        need(off + 4)
        ParsedNode(Array(bytes(off + 1) & 0xff),
          Array(child(be(bytes, off + 2, 2))), low, off + 4)
      case TypeSparse8 | TypeSparse12 | TypeSparse16 | TypeSparse24 |
          TypeSparse40 =>
        need(off + 2)
        val n = bytes(off + 1) & 0xff
        if (n == 0) fail("bti sparse node with zero transitions")
        val wBits = tpe match {
          case TypeSparse8 => 8
          case TypeSparse12 => 12
          case TypeSparse16 => 16
          case TypeSparse24 => 24
          case _ => 40
        }
        val ptrBase = off + 2 + n
        val ptrBytes = (n * wBits + 7) / 8
        need(ptrBase + ptrBytes)
        val ts = new Array[Int](n)
        val cs = new Array[Long](n)
        var i = 0
        while (i < n) {
          ts(i) = bytes(off + 2 + i) & 0xff
          if (i > 0 && ts(i) <= ts(i - 1))
            fail("bti sparse transitions not ascending")
          val d =
            if (wBits == 12) r12(bytes, ptrBase, i)
            else be(bytes, ptrBase + i * (wBits / 8), wBits / 8)
          cs(i) = child(d)
          i += 1
        }
        ParsedNode(ts, cs, low, ptrBase + ptrBytes)
      case TypeDense12 | TypeDense16 | TypeDense24 | TypeDense32 |
          TypeDense40 | TypeLongDense =>
        need(off + 3)
        val first = bytes(off + 1) & 0xff
        val range = (bytes(off + 2) & 0xff) + 1
        val wBits = tpe match {
          case TypeDense12 => 12
          case TypeDense16 => 16
          case TypeDense24 => 24
          case TypeDense32 => 32
          case TypeDense40 => 40
          case _ => 64
        }
        val ptrBase = off + 3
        val ptrBytes = (range * wBits + 7) / 8
        need(ptrBase + ptrBytes)
        val tb = new ArrayBuffer[Int](range)
        val cb = new ArrayBuffer[Long](range)
        var i = 0
        while (i < range) {
          val d =
            if (wBits == 12) r12(bytes, ptrBase, i)
            else be(bytes, ptrBase + i * (wBits / 8), wBits / 8)
          if (d != 0) { tb += (first + i); cb += child(d) } // 0 = no child
          i += 1
        }
        ParsedNode(tb.toArray, cb.toArray, low, ptrBase + ptrBytes)
      case other =>
        fail(s"bti node type $other unreachable") // 0..15 all handled
    }
  }

  /** Iterative depth-first walk of one trie: children in ascending
    * transition order, keys reconstructed from the path — (key, flags,
    * payloadOffset) stream out in lexicographic order. `limit` bounds
    * every node AND payload (payload length == flags nibble in both
    * payload codecs of this family). */
  def scanTrie(bytes: Array[Byte], root: Long,
      limit: Int): Iterator[(Array[Byte], Int, Int)] = {
    val acc = ArrayBuffer.empty[(Array[Byte], Int, Int)]
    val prefix = ArrayBuffer.empty[Byte]
    // frame: parsed node + next-child cursor; explicit stack (64 KiB keys)
    final case class Frame(node: ParsedNode, var i: Int)
    val stack = new java.util.ArrayDeque[Frame]()
    // Strictly-backward pointers make cycles impossible but not SHARING:
    // a hostile file can point two transitions at the same child, and ~40
    // such nodes give 2^40 root-to-leaf paths from a few hundred bytes. A
    // legitimate trie is a TREE whose every node occupies >= 1 byte at a
    // distinct offset, so its walk enters at most `limit` nodes — budget
    // the walk by that and fail typed instead of running exponentially.
    var visits = 0
    def enter(off: Long): Unit = {
      visits += 1
      if (visits > limit)
        fail(s"bti trie walk exceeded its $limit-node budget — " +
          "shared/repeated subtrees are not a valid serialized trie")
      val n = parseNode(bytes, off, limit)
      if (n.flags > 0) {
        if (n.payloadAt + n.flags > limit) fail("bti payload overruns trie")
        acc += ((prefix.toArray, n.flags, n.payloadAt))
      }
      stack.push(Frame(n, 0))
    }
    enter(root)
    while (!stack.isEmpty) {
      val f = stack.peek()
      if (f.i < f.node.transitions.length) {
        val t = f.node.transitions(f.i)
        val c = f.node.childOffsets(f.i)
        f.i += 1
        prefix += t.toByte
        enter(c)
      } else {
        stack.pop()
        if (prefix.nonEmpty) prefix.remove(prefix.length - 1)
      }
    }
    acc.iterator
  }

  /** Iterative point lookup in one trie: follow `key`'s bytes; None when a
    * transition is missing or the terminal node carries no payload. */
  def lookupTrie(bytes: Array[Byte], root: Long, limit: Int,
      key: Array[Byte]): Option[(Int, Int)] = {
    var off = root
    var depth = 0
    while (true) {
      val n = parseNode(bytes, off, limit)
      if (depth == key.length) {
        if (n.flags == 0) return None
        if (n.payloadAt + n.flags > limit) fail("bti payload overruns trie")
        return Some((n.flags, n.payloadAt))
      }
      val t = key(depth) & 0xff
      val idx = java.util.Arrays.binarySearch(n.transitions, t)
      if (idx < 0) return None
      off = n.childOffsets(idx)
      depth += 1
    }
    None // unreachable
  }

  // ---------------------------------------------------------------------
  // partition-trie wrappers (Partitions.db with the count/root tail)
  // ---------------------------------------------------------------------

  private def rootAndLimit(bytes: Array[Byte]): (Long, Int) = {
    if (bytes.length < 17) fail("bti Partitions.db too short")
    val root = be(bytes, bytes.length - 8, 8)
    val limit = bytes.length - 16
    if (root < 0 || root >= limit) fail(s"bti root offset $root out of range")
    (root, limit)
  }

  /** Partition count from the file tail (the cheap `estimatedKeys`). */
  def keyCount(bytes: Array[Byte]): Long = {
    if (bytes.length < 17) fail("bti Partitions.db too short")
    be(bytes, bytes.length - 16, 8)
  }

  private def decodePos(bytes: Array[Byte], flags: Int, at: Int): Long = {
    if (flags < 2) fail(s"bti partition payload flags $flags too small")
    beSigned(bytes, at + 1, flags - 1)
  }

  /** Full scan of a Partitions.db: (key, position) in key order. Positions
    * can be NEGATIVE: `~pos` is a Rows.db entry offset ([[BtiRowsFormat]]);
    * `>= 0` is a direct Data.db offset. */
  def fullScan(bytes: Array[Byte]): Iterator[(Array[Byte], Long)] = {
    val (root, limit) = rootAndLimit(bytes)
    scanTrie(bytes, root, limit).map { case (k, f, at) =>
      (k, decodePos(bytes, f, at))
    }
  }

  /** Full scan including each entry's stored key-hash byte. */
  def fullScanWithHash(bytes: Array[Byte])
      : Iterator[(Array[Byte], Byte, Long)] = {
    val (root, limit) = rootAndLimit(bytes)
    scanTrie(bytes, root, limit).map { case (k, f, at) =>
      (k, bytes(at), decodePos(bytes, f, at))
    }
  }

  /** Point lookup of one partition key; verifies the stored hash byte (the
    * lookup-time false-positive filter of the published design). */
  def lookup(bytes: Array[Byte], key: Array[Byte]): Option[Long] = {
    val (root, limit) = rootAndLimit(bytes)
    lookupTrie(bytes, root, limit, key).flatMap { case (f, at) =>
      if (bytes(at) != hashByte(key)) None
      else Some(decodePos(bytes, f, at))
    }
  }
}
