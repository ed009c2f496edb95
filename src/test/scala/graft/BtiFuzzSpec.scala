package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.bti.BtiTrieFormat

/** Property fuzzing of the bti (trie-indexed) Partitions.db codec
  * (round 19) — the last binary family without a fuzz harness. Same
  * template as the other codec suites: roundtrip against an INDEPENDENT
  * model (unsigned-lex sort + a key→position map, never the writer's own
  * traversal), byte-flip totality (typed errors only), truncation, and
  * the walk-budget guard against the one attack the backward-pointer
  * rule does NOT exclude: shared subtrees (a DAG), which would make the
  * full scan exponential in the file size. */
final class BtiFuzzSpec extends AnyFunSuite {

  private val unsignedLex: Ordering[Seq[Byte]] = new Ordering[Seq[Byte]] {
    def compare(a: Seq[Byte], b: Seq[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Seeded entries: unique non-empty keys of mixed length, positions
    * across every signed width including Rows.db (~offset) negatives. */
  private def genEntries(seed: Long, n: Int): Seq[(Array[Byte], Long)] = {
    val rnd = new scala.util.Random(seed)
    val keys = scala.collection.mutable.LinkedHashSet.empty[Seq[Byte]]
    while (keys.size < n) {
      val len = 1 + rnd.nextInt(12)
      keys += Seq.fill(len)(rnd.nextInt(256).toByte)
    }
    keys.toSeq.map { k =>
      val raw = rnd.nextLong() >>> rnd.nextInt(63) // every byte width
      (k.toArray, if (rnd.nextBoolean()) raw else ~raw)
    }
  }

  test("roundtrip vs an independent model at every pointer-width floor: " +
      "full scan is the unsigned-lex order, lookups hit, absent keys miss") {
    for (seed <- 0 until 6;
        floor <- Seq(0, 12, 16, 24, 32, 40, 64)) {
      val entries = genEntries(seed * 7919L + floor, 40 + seed * 13)
      val bytes = BtiTrieFormat.write(entries.iterator, floor)
      val model = entries.map { case (k, p) => (k.toSeq, p) }.toMap
      assert(BtiTrieFormat.keyCount(bytes) === entries.length.toLong)
      val scanned = BtiTrieFormat.fullScan(bytes)
        .map { case (k, p) => (k.toSeq, p) }.toSeq
      // exactly the model, in byte-comparable key order
      assert(scanned === model.toSeq.sortBy(_._1)(unsignedLex),
        s"seed=$seed floor=$floor")
      // every present key resolves through the point path (incl. the
      // stored hash byte); mangled keys miss
      val rnd = new scala.util.Random(seed + 1000L)
      entries.foreach { case (k, p) =>
        assert(BtiTrieFormat.lookup(bytes, k) === Some(p))
        val absent = k.clone(); absent(0) = (absent(0) ^ 0x5a).toByte
        if (!model.contains(absent.toSeq))
          assert(BtiTrieFormat.lookup(bytes, absent) === None)
        val longer = k :+ rnd.nextInt(256).toByte
        if (!model.contains(longer.toSeq))
          assert(BtiTrieFormat.lookup(bytes, longer) === None)
      }
      // the stored hash byte is the published short-hash of the key
      BtiTrieFormat.fullScanWithHash(bytes).foreach { case (k, h, _) =>
        assert(h === BtiTrieFormat.hashByte(k))
      }
    }
  }

  test("a hostile DAG (shared subtrees) fails typed within the node " +
      "budget instead of walking 2^50 paths") {
    val deepKey = Array.fill(50)(0x61.toByte)
    val out = new java.io.ByteArrayOutputStream()
    // offset 0: payload-only leaf, flags=2 (hash byte + 1-byte position);
    // the hash is deepKey's, so the depth-bounded point path can HIT it
    out.write(0x02)
    out.write(BtiTrieFormat.hashByte(deepKey) & 0xff)
    out.write(0x01)
    // 50 sparse-8 nodes, each pointing BOTH transitions at the previous
    // node — backward-only, acyclic, exponential path count
    var prev = 0L
    for (_ <- 0 until 50) {
      val off = out.size().toLong
      val d = off - prev
      assert(d <= 0xff, "fixture distances must stay 8-bit")
      out.write(0x50); out.write(2) // SPARSE_8, no payload, 2 children
      out.write(0x61); out.write(0x62)
      out.write(d.toInt); out.write(d.toInt)
      prev = off
    }
    def wbe(v: Long): Unit =
      (7 to 0 by -1).foreach(i => out.write(((v >>> (i * 8)) & 0xff).toInt))
    wbe(1L); wbe(prev) // keyCount, root
    val bytes = out.toByteArray
    assert(bytes.length < 400, "the attack must come from a tiny file")
    val ex = intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(bytes).foreach(_ => ())
    }
    assert(ex.getMessage.contains("node budget"))
    // the point path follows ONE root-to-leaf path, so it stays total
    // and depth-bounded even on the DAG — and resolves the leaf payload
    assert(BtiTrieFormat.lookup(bytes, deepKey) === Some(1L))
    // a short probe dead-ends on a payload-free interior node
    assert(BtiTrieFormat.lookup(bytes, Array[Byte](0x61)) === None)
  }

  test("seeded byte-flip fuzz: every mutation either parses or throws a " +
      "typed IO error — never OOM, runaway walk, or runtime exceptions") {
    val good = BtiTrieFormat.write(genEntries(42L, 60).iterator)
    val probe = genEntries(42L, 60).head._1
    val rnd = new scala.util.Random(20260816L)
    var parsed = 0; var rejected = 0
    for (_ <- 0 until 2000) {
      val b = good.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try {
        val n = BtiTrieFormat.fullScan(b).size
        assert(n <= b.length, "more entries than file bytes")
        BtiTrieFormat.lookup(b, probe)
        parsed += 1
      } catch {
        case _: java.io.IOException => rejected += 1
        case _: ArrayIndexOutOfBoundsException => rejected += 1
        case _: IndexOutOfBoundsException => rejected += 1
        case _: IllegalArgumentException => rejected += 1
      }
    }
    assert(parsed > 0, "no mutation parsed — fuzz harness too hostile")
    assert(rejected > 0, "no mutation rejected — guards not engaging")
  }

  test("Rows.db roundtrip vs an independent model: separators in order, " +
      "offsets and open markers exact across every partition") {
    val rnd = new scala.util.Random(99L)
    val w = new graft.sources.bti.BtiRowsFormat.Writer
    val model = (0 until 12).map { p =>
      val blocks = (0 until (1 + rnd.nextInt(9))).map { j =>
        val sep = Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(256).toByte)
        val marker =
          if (rnd.nextBoolean())
            Some((rnd.nextLong().abs, rnd.nextInt(Int.MaxValue).toLong))
          else None
        (sep, j * 4096L, marker)
      }.groupBy(_._1.toSeq).map(_._2.head).toSeq // unique separators
      val dataPos = p * (1L << 20)
      (w.append(blocks, dataPos), blocks, dataPos)
    }
    val bytes = w.finish()
    assert(graft.sources.bti.BtiRowsFormat.entryCount(bytes) === 12L)
    model.foreach { case (off, blocks, dataPos) =>
      val e = graft.sources.bti.BtiRowsFormat.readEntry(bytes, off)
      assert(e.dataPos === dataPos && e.blockCount === blocks.length)
      val got = graft.sources.bti.BtiRowsFormat.blocks(bytes, off)
        .map { case (s, o, m) => (s.toSeq, o, m) }.toSeq
      val want = blocks.map { case (s, o, m) => (s.toSeq, o, m) }
        .sortBy(_._1)(unsignedLex)
      assert(got === want)
    }
  }

  test("Rows.db byte-flip fuzz: every mutation parses or throws typed — " +
      "the per-entry trie stays bounded by its own entry record") {
    val rnd0 = new scala.util.Random(7L)
    val w = new graft.sources.bti.BtiRowsFormat.Writer
    val offs = (0 until 6).map { p =>
      w.append((0 until 5).map { j =>
        (Array.fill(4)((rnd0.nextInt(255) + 1).toByte), j * 512L,
          if (j % 2 == 0) Some((j * 1000L, 77L)) else None)
      }.groupBy(_._1.toSeq).map(_._2.head).toSeq, p * 8192L)
    }
    val good = w.finish()
    val rnd = new scala.util.Random(20260817L)
    var parsed = 0; var rejected = 0
    for (_ <- 0 until 1500) {
      val b = good.clone()
      for (_ <- 0 until 1 + rnd.nextInt(3)) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try {
        graft.sources.bti.BtiRowsFormat.entryCount(b)
        offs.foreach { o =>
          assert(graft.sources.bti.BtiRowsFormat.blocks(b, o).size
            <= b.length)
        }
        parsed += 1
      } catch {
        case _: java.io.IOException => rejected += 1
        case _: ArrayIndexOutOfBoundsException => rejected += 1
        case _: IndexOutOfBoundsException => rejected += 1
        case _: IllegalArgumentException => rejected += 1
      }
    }
    assert(parsed > 0 && rejected > 0,
      s"degenerate fuzz outcome: parsed=$parsed rejected=$rejected")
  }

  test("every-prefix truncation: typed failure or a bounded parse, " +
      "never a hang or untyped crash") {
    val good = BtiTrieFormat.write(genEntries(7L, 24).iterator)
    for (n <- 0 until good.length) {
      val b = java.util.Arrays.copyOf(good, n)
      try {
        // a truncated footer re-aims the root into arbitrary interior
        // bytes; whatever still parses must stay within the node budget
        assert(BtiTrieFormat.fullScan(b).size <= b.length)
      } catch {
        case _: java.io.IOException => ()
        case _: ArrayIndexOutOfBoundsException => ()
        case _: IndexOutOfBoundsException => ()
        case _: IllegalArgumentException => ()
      }
    }
  }
}
