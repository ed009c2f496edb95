package graft

import graft.ops.BtiOps
import graft.sources.bti.{BtiFixture, BtiRowIndexFixture, BtiRowsFormat, BtiTrieFormat}
import graft.sources.indexdb.{IndexDb, IndexDbFixture}

/** The bti (trie-indexed) format family: trie codec roundtrips over the
  * full published node-type surface, point lookups, stack safety on huge
  * keys, the Rows.db row-index codec, and DSv2 relation-equivalence with
  * the big-format Index.db scan on the same logical data (the q101 gate)
  * plus the q102/q103 access-path gates. */
class BtiSpec extends SparkSpec {

  private def key(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private def roundtrip(entries: Seq[(Array[Byte], Long)],
      widthFloorBits: Int = 0): Seq[(Seq[Byte], Long)] =
    BtiTrieFormat.fullScan(
        BtiTrieFormat.write(entries.iterator, widthFloorBits))
      .map { case (k, p) => (k.toSeq, p) }.toSeq

  private def sortedUnsigned(
      entries: Seq[(Array[Byte], Long)]): Seq[(Seq[Byte], Long)] =
    entries.map { case (k, p) => (k.toSeq, p) }.sortWith {
      case ((a, _), (b, _)) =>
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n && a(i) == b(i)) i += 1
        if (i < n) (a(i) & 0xff) < (b(i) & 0xff) else a.length < b.length
    }

  test("trie roundtrip: sorted enumeration, payloads on inner nodes, " +
      "shared prefixes, negative (row-index ref) positions") {
    val entries = Seq(
      key(2, 3) -> 10L, // prefix of the next two keys: payload on an
      key(2, 3, 1) -> 20L, // inner node must survive
      key(2, 3, 9) -> 30L,
      key(1) -> 0L,
      key(0xfe, 0xff) -> 1234567890123L, // high (signed-negative) bytes
      key(0xfe, 1) -> ~12345L) // a ~entryOffset row-index reference
    assert(roundtrip(entries) === sortedUnsigned(entries))
  }

  test("trie roundtrip: 10k random keys exercises wide pointers and " +
      "dense/sparse nodes; count tail matches; every key point-looks-up") {
    val rnd = new scala.util.Random(42)
    val keys = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Long]
    while (keys.size < 10000) {
      val len = 4 + rnd.nextInt(9)
      val k = Array.fill(len)(rnd.nextInt(256).toByte)
      if (!keys.contains(k.toSeq)) keys(k.toSeq) = rnd.nextLong(1L << 40)
    }
    val entries = keys.toSeq.map { case (k, p) => (k.toArray, p) }
    val bytes = BtiTrieFormat.write(entries.iterator)
    assert(bytes.length > 0x10000, "trie must be large enough for wide " +
      s"pointer coverage, got ${bytes.length}")
    assert(BtiTrieFormat.keyCount(bytes) === 10000L)
    val got = BtiTrieFormat.fullScan(bytes)
      .map { case (k, p) => (k.toSeq, p) }.toMap
    assert(got === keys.toMap)
    // enumeration is sorted
    val ks = BtiTrieFormat.fullScan(bytes).map(_._1.toSeq).toSeq
    ks.sliding(2).foreach {
      case Seq(a, b) =>
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n && a(i) == b(i)) i += 1
        assert(if (i < n) (a(i) & 0xff) < (b(i) & 0xff)
          else a.length < b.length, s"unsorted at $a / $b")
      case _ => ()
    }
    // every key point-looks-up to its payload; perturbed keys miss
    entries.take(500).foreach { case (k, p) =>
      assert(BtiTrieFormat.lookup(bytes, k) === Some(p))
      val miss = k.clone(); miss(miss.length - 1) = (miss.last ^ 1).toByte
      if (!keys.contains(miss.toSeq))
        assert(BtiTrieFormat.lookup(bytes, miss) === None)
      assert(BtiTrieFormat.lookup(bytes, k :+ 0.toByte) === None)
      assert(BtiTrieFormat.lookup(bytes, k.dropRight(1)).forall(
        keys.get(k.dropRight(1).toSeq).contains(_)))
    }
  }

  test("width floors force the 24/32/40/64-bit and 12-bit reader paths " +
      "(DENSE_12..LONG_DENSE, SPARSE_12..SPARSE_40) — same relation back") {
    val rnd = new scala.util.Random(7)
    val entries = (0 until 2000).map { _ =>
      (Array.fill(3 + rnd.nextInt(6))(rnd.nextInt(256).toByte),
        rnd.nextLong(1L << 30))
    }.distinctBy(_._1.toSeq)
    val expect = sortedUnsigned(entries)
    for (floor <- Seq(0, 12, 16, 24, 32, 40, 64)) {
      assert(roundtrip(entries, floor) === expect, s"widthFloorBits=$floor")
      val bytes = BtiTrieFormat.write(entries.iterator, floor)
      entries.take(50).foreach { case (k, p) =>
        assert(BtiTrieFormat.lookup(bytes, k) === Some(p),
          s"lookup under widthFloorBits=$floor")
      }
    }
  }

  test("iterative walk survives huge keys: a 70 KiB key (past any JVM " +
      "recursion depth) roundtrips and point-looks-up") {
    val rnd = new scala.util.Random(3)
    val huge = Array.fill(70 * 1024)(rnd.nextInt(256).toByte)
    val fourK = Array.fill(4096)((1 + rnd.nextInt(255)).toByte)
    val entries = Seq(huge -> 11L, fourK -> 22L, key(9) -> 33L)
    assert(roundtrip(entries) === sortedUnsigned(entries))
    val bytes = BtiTrieFormat.write(entries.iterator)
    assert(BtiTrieFormat.lookup(bytes, huge) === Some(11L))
    assert(BtiTrieFormat.lookup(bytes, fourK) === Some(22L))
    assert(BtiTrieFormat.lookup(bytes, huge.dropRight(1)) === None)
  }

  test("seeded fuzz: random key sets with adversarial shared prefixes " +
      "roundtrip and lookup across many trie shapes") {
    val rnd = new scala.util.Random(1234)
    for (round <- 0 until 20) {
      val base = Array.fill(1 + rnd.nextInt(12))(rnd.nextInt(256).toByte)
      val keys = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Long]
      while (keys.size < 50 + rnd.nextInt(200)) {
        // half the keys extend a shared prefix of the base, half are free
        val k =
          if (rnd.nextBoolean())
            base.take(1 + rnd.nextInt(base.length)) ++
              Array.fill(rnd.nextInt(6))(rnd.nextInt(256).toByte)
          else Array.fill(1 + rnd.nextInt(10))(rnd.nextInt(256).toByte)
        if (k.nonEmpty && !keys.contains(k.toSeq))
          keys(k.toSeq) = rnd.nextLong() >> rnd.nextInt(40)
      }
      val entries = keys.toSeq.map { case (k, p) => (k.toArray, p) }
      val bytes = BtiTrieFormat.write(entries.iterator)
      assert(roundtrip(entries) === sortedUnsigned(entries), s"round $round")
      entries.foreach { case (k, p) =>
        assert(BtiTrieFormat.lookup(bytes, k) === Some(p), s"round $round")
      }
    }
  }

  test("corrupt tries throw typed IOExceptions: truncation, bad root, " +
      "node-body overrun, zero pointer distance") {
    val good = BtiTrieFormat.write(Iterator((key(1, 2), 7L)))
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(good.take(10))
    }
    val badRoot = good.clone()
    badRoot(badRoot.length - 1) = 0x7f // root offset past the trie
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(badRoot)
    }
    // LONG_DENSE head on a tiny trie: the 8-byte pointer block overruns
    val overrun = good.clone()
    overrun(0) = (15 << 4).toByte
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(overrun).toList
    }
    // hand-built SINGLE_8 with distance 0: must be a typed error, not an
    // infinite self-recursion (ADVICE r7)
    val zeroDist = Array[Byte](
      (BtiTrieFormat.TypeSingle8 << 4).toByte, 0x41, 0x00, // d = 0
      0, 0, 0, 0, 0, 0, 0, 1, // count tail = 1
      0, 0, 0, 0, 0, 0, 0, 0) // root = 0
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(zeroDist).toList
    }
    // sparse node whose transition/pointer region extends past the array
    val sparseOverrun = Array[Byte](
      (BtiTrieFormat.TypeSparse16 << 4).toByte, 200.toByte, // 200 kids
      0, 0, 0, 0, 0, 0, 0, 1,
      0, 0, 0, 0, 0, 0, 0, 0)
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(sparseOverrun).toList
    }
  }

  test("Rows.db roundtrip: entries append, trailers resolve, separator " +
      "tries enumerate blocks in order, entry count tail matches") {
    def be8(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    val md = 777777777777L // open-marker markedForDeleteAt_us
    val ldt = 123456789L // open-marker localDeletionTime_s
    val w = new BtiRowsFormat.Writer
    // e1 mixes payload layouts: block 0 plain, blocks 1-2 under an open
    // range-tombstone marker (flags = w+12 codec path)
    val e1 = w.append(Seq(
      (be8(0L), 0L, None),
      (be8(1L), 4096L, Some((md, ldt))),
      (be8(2L), 8192L, Some((md, ldt)))), dataPos = 100L)
    val e2 = w.append(Seq((be8(0L), 0L, None), (be8(1L), 4096L, None)),
      dataPos = 555L)
    val bytes = w.finish()
    assert(BtiRowsFormat.entryCount(bytes) === 2L)
    val r1 = BtiRowsFormat.readEntry(bytes, e1)
    assert(r1.dataPos === 100L && r1.blockCount === 3)
    assert(BtiRowsFormat.blocks(bytes, e1).map {
      case (s, o, m) => (java.nio.ByteBuffer.wrap(s).getLong, o, m)
    }.toSeq === Seq((0L, 0L, None), (1L, 4096L, Some((md, ldt))),
      (2L, 8192L, Some((md, ldt)))))
    val r2 = BtiRowsFormat.readEntry(bytes, e2)
    assert(r2.dataPos === 555L && r2.blockCount === 2)
    assert(BtiRowsFormat.blocks(bytes, e2).forall(_._3.isEmpty))
    intercept[java.io.IOException] {
      BtiRowsFormat.readEntry(bytes, bytes.length.toLong)
    }
    // marker payloads cap the offset width at 3 bytes (flags nibble)
    intercept[IllegalArgumentException] {
      new BtiRowsFormat.Writer().append(
        Seq((be8(0L), 1L << 32, Some((md, ldt)))), dataPos = 0L)
    }
  }

  test("q101 gate: the bti DSv2 scan is relation-equal to the big-format " +
      "Index.db scan on the same logical data") {
    val bti = IndexDb.readBti(spark, BtiFixture.ensureFiles(spark, Sf0001))
      .orderBy("sstable_id", "position").collect()
    val big = IndexDb.read(spark, IndexDbFixture.ensureFiles(spark, Sf0001))
      .orderBy("sstable_id", "position").collect()
    assert(bti.length === big.length)
    assert(bti.nonEmpty)
    bti.zip(big).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getAs[Array[Byte]](1).toSeq === b.getAs[Array[Byte]](1).toSeq)
      assert(a.getLong(2) === b.getLong(2))
    }
    // file pruning: sstable_id pushdown prunes bti files too
    val one = bti.head.getString(0)
    import org.apache.spark.sql.functions.col
    val pruned = IndexDb.readBti(spark, BtiFixture.ensureFiles(spark, Sf0001))
      .where(col("sstable_id") === one)
    assert(pruned.select("sstable_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq(one))
  }

  test("q102 gate: point-looking-up every fixture key reproduces the " +
      "full-scan relation exactly") {
    val viaLookup = BtiOps.lookupAll(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaScan = IndexDb.readBti(spark, BtiFixture.ensureFiles(spark, Sf0001))
      .collect()
      .map(r => (r.getString(0),
        java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](1)).getLong,
        r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaLookup === viaScan)
    assert(viaLookup.nonEmpty)
    assert(!viaLookup.exists(_._3 == -1L), "no lookup may miss")
  }

  test("row-index separators are byte-comparable clustering prefixes: " +
      "random clustering sets roundtrip through composite encode, the " +
      "trie, and decode, preserving long order") {
    val rnd = new scala.util.Random(77)
    for (round <- 0 until 25) {
      // random strictly-increasing non-negative clusterings, including
      // adjacent values (shared 7-byte prefixes stress the trie split)
      var cls = Vector.empty[Long]
      var v = rnd.nextInt(1000).toLong
      val n = 2 + rnd.nextInt(60)
      while (cls.length < n) {
        cls :+= v
        v += (if (rnd.nextBoolean()) 1L else 1L + rnd.nextInt(1 << 20))
      }
      // every third round runs under an open marker (blocks 1+, the
      // fixture's whole-partition range-deletion model)
      val marker =
        if (round % 3 == 0) Some((1000000L + round, 86400L * round)) else None
      val blocks = cls.zipWithIndex.map { case (cl, i) =>
        (BtiRowIndexFixture.SepValidator.encode(Seq(cl)),
          i.toLong * BtiRowIndexFixture.BlockBytes,
          if (i > 0) marker else None)
      }
      // composite encoding preserves order byte-comparably
      blocks.map(_._1).sliding(2).foreach {
        case Seq(a, b) =>
          val cmp = a.zip(b).collectFirst {
            case (x, y) if x != y => (x & 0xff) - (y & 0xff)
          }.getOrElse(a.length - b.length)
          assert(cmp < 0, s"round $round: separators not byte-increasing")
        case _ => ()
      }
      val w = new BtiRowsFormat.Writer
      val entryOff = w.append(blocks, 12345L)
      val bytes = w.finish()
      val back = BtiRowsFormat.blocks(bytes, entryOff).toVector
      assert(back.length === cls.length, s"round $round")
      back.zip(cls).zipWithIndex.foreach { case (((sep, off, m), cl), i) =>
        assert(BtiRowIndexFixture.decodeSeparator(sep) === cl,
          s"round $round block $i")
        assert(off === i.toLong * BtiRowIndexFixture.BlockBytes)
        assert(m === (if (i > 0) marker else None), s"round $round block $i")
      }
      val entry = BtiRowsFormat.readEntry(bytes, entryOff)
      assert(entry.blockCount === cls.length && entry.dataPos === 12345L)
    }
  }

  test("q103 gate: the row-index roundtrip's structural checks hold " +
      "(hash_ok == partitions, tiled_ok == indexed, blocks consistent)") {
    val rows = BtiOps.rowIndexRoundtrip(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val partitions = r.getLong(1); val indexed = r.getLong(2)
      val blocks = r.getLong(3); val tiledOk = r.getLong(7)
      val hashOk = r.getLong(8)
      val markers = r.getAs[Long]("markers")
      val markerOk = r.getAs[Long]("marker_ok")
      assert(partitions > 0)
      assert(hashOk === partitions, s"hash mismatch in ${r.getString(0)}")
      assert(tiledOk === indexed, s"tiling broke in ${r.getString(0)}")
      assert(blocks >= 2 * indexed, "indexed partitions have >= 2 blocks")
      assert(markerOk === indexed,
        s"open-marker structure broke in ${r.getString(0)}")
      assert(markers <= blocks - indexed,
        "markers only on blocks after the first")
    }
    // the set must actually exercise the indexed path
    assert(rows.map(_.getLong(2)).sum > 0, "no partition was row-indexed")
    // ... and the open-marker payload path
    assert(rows.map(_.getAs[Long]("markers")).sum > 0,
      "no block carried an open-marker deletion time")
  }

  test("the DSv2 bti scan resolves ~refs through Rows.db transparently: " +
      "the row-indexed fixture set scans to the same relation as the " +
      "direct-payload set") {
    val direct = IndexDb.readBti(spark, BtiFixture.ensureFiles(spark, Sf0001))
      .orderBy("sstable_id", "position").collect()
    val viaRows = IndexDb.readBti(spark,
        BtiRowIndexFixture.ensureFiles(spark, Sf0001))
      .orderBy("sstable_id", "position").collect()
    assert(direct.length === viaRows.length)
    direct.zip(viaRows).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getAs[Array[Byte]](1).toSeq === b.getAs[Array[Byte]](1).toSeq)
      assert(a.getLong(2) === b.getLong(2))
    }
  }
}
