package graft

import graft.sources.bti.{BtiFixture, BtiTrieFormat}
import graft.sources.indexdb.{IndexDb, IndexDbFixture}

/** The bti (trie-indexed) Partitions.db beachhead: trie codec roundtrips,
  * node-type coverage, and DSv2 relation-equivalence with the big-format
  * Index.db scan on the same logical data (the q101 gate). */
class BtiSpec extends SparkSpec {

  private def key(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private def roundtrip(entries: Seq[(Array[Byte], Long)])
      : Seq[(Seq[Byte], Long)] =
    BtiTrieFormat.fullScan(BtiTrieFormat.write(entries.iterator))
      .map { case (k, p) => (k.toSeq, p) }.toSeq

  test("trie roundtrip: sorted enumeration, payloads on inner nodes, " +
      "shared prefixes") {
    val entries = Seq(
      key(2, 3) -> 10L, // prefix of the next two keys: payload on an
      key(2, 3, 1) -> 20L, // inner node must survive
      key(2, 3, 9) -> 30L,
      key(1) -> 0L,
      key(0xfe, 0xff) -> 1234567890123L, // high (signed-negative) bytes
      key(0xfe, 1) -> 5L)
    val got = roundtrip(entries)
    val expect = entries.map { case (k, p) => (k.toSeq, p) }
      .sortBy(_._1.map(_ & 0xff).toIndexedSeq
        .asInstanceOf[Iterable[Int]].toSeq.mkString(","))
    // lexicographic UNSIGNED byte order
    val sorted = entries.map { case (k, p) => (k.toSeq, p) }.sortWith {
      case ((a, _), (b, _)) =>
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n && a(i) == b(i)) i += 1
        if (i < n) (a(i) & 0xff) < (b(i) & 0xff) else a.length < b.length
    }
    assert(got === sorted)
    assert(expect.size === entries.size) // silence unused; derivation above
  }

  test("trie roundtrip: 10k random keys exercises wide (40-bit) pointers " +
      "and dense/sparse nodes; count tail matches") {
    val rnd = new scala.util.Random(42)
    val keys = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Long]
    while (keys.size < 10000) {
      val len = 4 + rnd.nextInt(9)
      val k = Array.fill(len)(rnd.nextInt(256).toByte)
      if (!keys.contains(k.toSeq)) keys(k.toSeq) = rnd.nextLong(1L << 40)
    }
    val entries = keys.toSeq.map { case (k, p) => (k.toArray, p) }
    val bytes = BtiTrieFormat.write(entries.iterator)
    assert(bytes.length > 0x10000, "trie must be large enough for 40-bit " +
      s"pointer coverage, got ${bytes.length}")
    assert(BtiTrieFormat.keyCount(bytes) === 10000L)
    val got = BtiTrieFormat.fullScan(bytes)
      .map { case (k, p) => (k.toSeq, p) }.toMap
    assert(got === keys.toMap)
    // and enumeration is sorted: positions of consecutive keys compare
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
  }

  test("corrupt tries throw: bad root, truncated payload, unknown type") {
    val good = BtiTrieFormat.write(Iterator((key(1, 2), 7L)))
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(good.take(10))
    }
    val badRoot = good.clone()
    badRoot(badRoot.length - 1) = 0x7f // root offset past the trie
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(badRoot)
    }
    val badType = good.clone()
    badType(0) = (15 << 4).toByte // LONG_DENSE: not in the subset
    intercept[java.io.IOException] {
      BtiTrieFormat.fullScan(badType).toList
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
}
