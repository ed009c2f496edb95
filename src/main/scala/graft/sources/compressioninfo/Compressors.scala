package graft.sources.compressioninfo

import java.util.zip.{Deflater, Inflater}

/** The chunk-level block codecs Cassandra ships as published `ICompressor`
  * implementations — LZ4Compressor (the default), SnappyCompressor,
  * DeflateCompressor and ZstdCompressor. CompressionInfo.db's header names
  * the class (the reference surfaces it verbatim as the table's
  * `compression` property, e.g. SSTableMetadata's compressor column);
  * readers select the codec from that name, which is what
  * [[Compressors.byName]] does for [[ChunkedData.ChunkedInputStream]].
  *
  * All four share the identical chunk framing (`compressed bytes +
  * CRC32`, raw-stored rule past `max_compressed_length`) — only the block
  * transform differs, so the codec is one swappable kernel under the same
  * chunk table. Like every binary codec here, the non-LZ4 paths are
  * self-roundtripped (written from the published layout, read back through
  * the production path) — byte-parity against live-node files is untestable
  * in this environment (README's disclosure applies).
  */
object Compressors {

  /** One block transform: compress never writes past
    * `maxCompressedLength(srcLen)` scratch bytes; decompress must fill
    * exactly `outLen` bytes from exactly `payloadLen` compressed bytes and
    * throw otherwise (truncated/corrupt chunks must not pass silently —
    * the CRC catches bit flips, the length checks catch framing bugs). */
  trait ChunkCompressor extends Serializable {
    /** The simple class name CompressionInfo.db stores. */
    def name: String
    def maxCompressedLength(srcLen: Int): Int
    def compress(src: Array[Byte], srcLen: Int, dst: Array[Byte]): Int
    def decompress(src: Array[Byte], payloadLen: Int, dst: Array[Byte],
        outLen: Int): Unit
  }

  object Lz4 extends ChunkCompressor {
    @transient private lazy val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()
    override def name = "LZ4Compressor"
    override def maxCompressedLength(srcLen: Int): Int =
      factory.fastCompressor().maxCompressedLength(srcLen)
    override def compress(src: Array[Byte], srcLen: Int, dst: Array[Byte]): Int =
      factory.fastCompressor().compress(src, 0, srcLen, dst, 0)
    override def decompress(src: Array[Byte], payloadLen: Int, dst: Array[Byte],
        outLen: Int): Unit = {
      // the fast decompressor is driven by the KNOWN uncompressed length
      // and reports how many compressed bytes it consumed
      val read = factory.fastDecompressor().decompress(src, 0, dst, 0, outLen)
      if (read != payloadLen)
        throw new java.io.IOException(
          s"LZ4 chunk decompressed from $read of $payloadLen bytes")
    }
  }

  object Snappy extends ChunkCompressor {
    override def name = "SnappyCompressor"
    override def maxCompressedLength(srcLen: Int): Int =
      org.xerial.snappy.Snappy.maxCompressedLength(srcLen)
    override def compress(src: Array[Byte], srcLen: Int, dst: Array[Byte]): Int =
      org.xerial.snappy.Snappy.rawCompress(src, 0, srcLen, dst, 0)
    override def decompress(src: Array[Byte], payloadLen: Int, dst: Array[Byte],
        outLen: Int): Unit = {
      val n = org.xerial.snappy.Snappy.rawUncompress(src, 0, payloadLen, dst, 0)
      if (n != outLen)
        throw new java.io.IOException(
          s"Snappy chunk decompressed to $n of $outLen bytes")
    }
  }

  /** DeflateCompressor: raw deflate blocks (nowrap — no zlib envelope; the
    * chunk CRC framing already provides integrity, matching Cassandra's
    * use of `new Deflater(level, true)` / `new Inflater(true)`). The
    * Deflater/Inflater objects are stateful natives — pooled per thread,
    * reset per chunk, like Cassandra's own ThreadLocal pair. */
  object Deflate extends ChunkCompressor {
    override def name = "DeflateCompressor"
    @transient private lazy val deflaters =
      ThreadLocal.withInitial[Deflater](() =>
        new Deflater(Deflater.DEFAULT_COMPRESSION, true))
    @transient private lazy val inflaters =
      ThreadLocal.withInitial[Inflater](() => new Inflater(true))
    // worst case for deflate is stored blocks: 5 B per 16 KiB + slack
    override def maxCompressedLength(srcLen: Int): Int =
      srcLen + (srcLen >> 8) + 64
    override def compress(src: Array[Byte], srcLen: Int, dst: Array[Byte]): Int = {
      val d = deflaters.get()
      d.reset()
      d.setInput(src, 0, srcLen)
      d.finish()
      var off = 0
      while (!d.finished()) {
        if (off >= dst.length)
          throw new java.io.IOException("deflate scratch exhausted")
        off += d.deflate(dst, off, dst.length - off)
      }
      off
    }
    override def decompress(src: Array[Byte], payloadLen: Int, dst: Array[Byte],
        outLen: Int): Unit = {
      val inf = inflaters.get()
      inf.reset()
      inf.setInput(src, 0, payloadLen)
      var off = 0
      while (off < outLen && !inf.finished()) {
        val n = inf.inflate(dst, off, outLen - off)
        if (n == 0 && inf.needsInput())
          throw new java.io.IOException("truncated deflate chunk")
        off += n
      }
      if (off != outLen)
        throw new java.io.IOException(
          s"deflate chunk inflated to $off of $outLen bytes")
    }
  }

  /** ZstdCompressor (Cassandra's default compression_level is 3). */
  object Zstd extends ChunkCompressor {
    override def name = "ZstdCompressor"
    private val Level = 3
    override def maxCompressedLength(srcLen: Int): Int = {
      val bound = com.github.luben.zstd.Zstd.compressBound(srcLen.toLong)
      if (bound > Int.MaxValue) Int.MaxValue else bound.toInt
    }
    override def compress(src: Array[Byte], srcLen: Int, dst: Array[Byte]): Int = {
      val n = com.github.luben.zstd.Zstd.compressByteArray(
        dst, 0, dst.length, src, 0, srcLen, Level)
      if (com.github.luben.zstd.Zstd.isError(n))
        throw new java.io.IOException(
          "zstd compress: " + com.github.luben.zstd.Zstd.getErrorName(n))
      n.toInt
    }
    override def decompress(src: Array[Byte], payloadLen: Int, dst: Array[Byte],
        outLen: Int): Unit = {
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        dst, 0, outLen, src, 0, payloadLen)
      if (com.github.luben.zstd.Zstd.isError(n))
        throw new java.io.IOException(
          "zstd decompress: " + com.github.luben.zstd.Zstd.getErrorName(n))
      if (n != outLen)
        throw new java.io.IOException(
          s"zstd chunk decompressed to $n of $outLen bytes")
    }
  }

  val All: Seq[ChunkCompressor] = Seq(Lz4, Snappy, Deflate, Zstd)

  /** Codec for a CompressionInfo.db compressor name — accepts both the
    * simple class name the component stores and a fully-qualified
    * `org.apache.cassandra.io.compress.*` spelling. */
  def byName(name: String): ChunkCompressor = {
    val simple = name.substring(name.lastIndexOf('.') + 1)
    All.find(_.name == simple).getOrElse(
      throw new java.io.IOException(s"unsupported compressor '$name' " +
        s"(supported: ${All.map(_.name).mkString(", ")})"))
  }
}
