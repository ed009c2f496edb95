package graft.sources.filterdb

import java.io.{DataInput, DataOutput}

/** The REAL Cassandra Filter.db component — the partition-key bloom filter
  * (`BloomFilterSerializer` + `OffHeapBitSet`, 4.0+ "nb"):
  *
  * ```
  * hash_count:int  word_count:int  word:long(BE) × word_count
  * ```
  *
  * Bit addressing follows `OffHeapBitSet`: bit `i` lives in byte `i >> 3`
  * at position `i & 7`, and serialization emits 8-byte words whose LOW
  * byte is the lower memory address — i.e. bit `i` of the filter is bit
  * `i % 64` (little-endian) of big-endian-written word `i / 64`.
  *
  * Key hashing is Cassandra's `MurmurHash.hash3_x64_128` — the standard
  * MurmurHash3 x64 128-bit variant EXCEPT that tail bytes are
  * SIGN-EXTENDED (a long-kept compatibility quirk of Cassandra's Java
  * port; canonical implementations mask with 0xff). Bit indexes are
  * `((h1 + i·h2) & Long.MaxValue) % bits` for i in [0, hashCount) —
  * `BloomFilter.indexes`' abs-by-mask normalization.
  *
  * Same honesty boundary as the other real-format readers: written from
  * the published source, no live Cassandra here to cross-write fixtures.
  * The spec pins the contract that matters to any bloom filter:
  * NO false negatives (every inserted key found), false positives rare. */
object FilterDbFormat {

  val Suffix = "-Filter.db"

  final case class Filter(hashCount: Int, words: Array[Long]) {
    def bits: Long = words.length.toLong * 64L

    private def bitGet(i: Long): Boolean =
      (words((i >>> 6).toInt) >>> (i & 63L).toInt & 1L) != 0L

    private def bitSet(i: Long): Unit =
      words((i >>> 6).toInt) |= (1L << (i & 63L).toInt)

    def add(key: Array[Byte]): Unit = {
      val h = Murmur3Cassandra.hash3x64128(key, 0L)
      var base = h(0)
      var i = 0
      while (i < hashCount) {
        bitSet((base & Long.MaxValue) % bits)
        base += h(1)
        i += 1
      }
    }

    def mightContain(key: Array[Byte]): Boolean = {
      val h = Murmur3Cassandra.hash3x64128(key, 0L)
      var base = h(0)
      var i = 0
      while (i < hashCount) {
        if (!bitGet((base & Long.MaxValue) % bits)) return false
        base += h(1)
        i += 1
      }
      true
    }
  }

  /** A fresh filter sized like Cassandra's p≈0.01 defaults: ~10 bits and
    * 7 hash rounds per expected key. */
  def create(expectedKeys: Long): Filter = {
    val bits = math.max(64L, expectedKeys * 10L)
    val words = ((bits + 63L) / 64L).toInt
    Filter(7, new Array[Long](words))
  }

  def write(out: DataOutput, f: Filter): Unit = {
    out.writeInt(f.hashCount)
    out.writeInt(f.words.length)
    f.words.foreach(out.writeLong)
  }

  def parse(in: DataInput): Filter = {
    val hashCount = in.readInt()
    if (hashCount < 1 || hashCount > 64)
      throw new java.io.IOException(s"implausible hash count $hashCount")
    val wordCount = in.readInt()
    if (wordCount < 1 || wordCount > (1 << 28))
      throw new java.io.IOException(s"implausible word count $wordCount")
    // grow incrementally instead of allocating the full claimed array up
    // front: a count a corrupt byte inflated past the file's real size
    // hits EOF with memory bounded by the data actually present
    // (round-17 fuzz; DataInput exposes no remaining-bytes bound)
    val b = Array.newBuilder[Long]
    b.sizeHint(math.min(wordCount, 1 << 16))
    var i = 0
    while (i < wordCount) { b += in.readLong(); i += 1 }
    Filter(hashCount, b.result())
  }
}

/** Cassandra's `MurmurHash.hash3_x64_128`: standard MurmurHash3 x64/128
  * with the sign-extended tail bytes Cassandra keeps for on-disk
  * compatibility. */
object Murmur3Cassandra {

  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  @inline private def rotl64(v: Long, n: Int): Long =
    (v << n) | (v >>> (64 - n))

  @inline private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Little-endian 8-byte block at `offset`. */
  @inline private def block(data: Array[Byte], offset: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) {
      v = (v << 8) | (data(offset + i) & 0xffL)
      i -= 1
    }
    v
  }

  def hash3x64128(data: Array[Byte], seed: Long): Array[Long] = {
    val length = data.length
    val nblocks = length >> 4
    var h1 = seed
    var h2 = seed

    var b = 0
    while (b < nblocks) {
      var k1 = block(data, b * 16)
      var k2 = block(data, b * 16 + 8)
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }

    // tail: SIGN-EXTENDED bytes (Cassandra's compatibility quirk)
    val off = nblocks << 4
    var k1 = 0L
    var k2 = 0L
    val tail = length & 15
    if (tail >= 15) k2 ^= data(off + 14).toLong << 48
    if (tail >= 14) k2 ^= data(off + 13).toLong << 40
    if (tail >= 13) k2 ^= data(off + 12).toLong << 32
    if (tail >= 12) k2 ^= data(off + 11).toLong << 24
    if (tail >= 11) k2 ^= data(off + 10).toLong << 16
    if (tail >= 10) k2 ^= data(off + 9).toLong << 8
    if (tail >= 9) {
      k2 ^= data(off + 8).toLong
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (tail >= 8) k1 ^= data(off + 7).toLong << 56
    if (tail >= 7) k1 ^= data(off + 6).toLong << 48
    if (tail >= 6) k1 ^= data(off + 5).toLong << 40
    if (tail >= 5) k1 ^= data(off + 4).toLong << 32
    if (tail >= 4) k1 ^= data(off + 3).toLong << 24
    if (tail >= 3) k1 ^= data(off + 2).toLong << 16
    if (tail >= 2) k1 ^= data(off + 1).toLong << 8
    if (tail >= 1) {
      k1 ^= data(off).toLong
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= length.toLong
    h2 ^= length.toLong
    h1 += h2
    h2 += h1
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 += h2
    h2 += h1
    Array(h1, h2)
  }
}
