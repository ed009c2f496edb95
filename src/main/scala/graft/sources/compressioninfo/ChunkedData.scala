package graft.sources.compressioninfo

import java.io.{InputStream, OutputStream}
import java.util.zip.CRC32

/** Chunked compression of Data.db contents — the real Cassandra layout
  * (`CompressedSequentialWriter` / `CompressedChunkReader`): the logical
  * (uncompressed) stream is cut into fixed `chunkLength` chunks; each chunk
  * is block-compressed and written as `compressed bytes + CRC32(compressed)`;
  * CompressionInfo.db records the compressed file offset of every chunk.
  * Positions everywhere else (partition index entries, `data_length`) are
  * UNCOMPRESSED positions — readers map them through the chunk table
  * (`CompressionMetadata.chunkFor`), which is exactly what
  * [[ChunkedInputStream]] does. The block transform is any of Cassandra's
  * four published codecs ([[Compressors]]); the read side selects it from
  * the compressor name CompressionInfo.db stores.
  *
  * The 4.0 `max_compressed_length` rule is honored on read: a chunk whose
  * on-disk payload is >= maxCompressedLength was stored RAW (compression
  * did not pay); its bytes are served without decompression. */
object ChunkedData {

  /** Buffers `chunkLength` logical bytes at a time, emitting compressed
    * chunks to `target`. Call [[finish]] exactly once — it flushes the tail
    * chunk and returns the chunk-offset table for CompressionInfo.db. */
  final class ChunkingOutputStream(target: OutputStream, chunkLength: Int,
      maxCompressedLength: Int = Int.MaxValue,
      compressor: Compressors.ChunkCompressor = Compressors.Lz4)
      extends OutputStream {
    private val buf = new Array[Byte](chunkLength)
    private val scratch =
      new Array[Byte](compressor.maxCompressedLength(chunkLength))
    private var fill = 0
    private var dataLength = 0L
    private var compressedPos = 0L
    private val offsets = Vector.newBuilder[Long]
    private var finished = false

    override def write(b: Int): Unit = {
      buf(fill) = b.toByte
      fill += 1
      dataLength += 1
      if (fill == chunkLength) flushChunk()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off
      var remaining = len
      while (remaining > 0) {
        val n = math.min(remaining, chunkLength - fill)
        System.arraycopy(b, o, buf, fill, n)
        fill += n
        dataLength += n
        o += n
        remaining -= n
        if (fill == chunkLength) flushChunk()
      }
    }

    private def flushChunk(): Unit = {
      if (fill == 0) return
      offsets += compressedPos
      val clen = compressor.compress(buf, fill, scratch)
      // min_compress_ratio rule: an incompressible chunk is stored raw
      val (out, olen) =
        if (clen >= maxCompressedLength) (buf, fill) else (scratch, clen)
      target.write(out, 0, olen)
      val crc = new CRC32()
      crc.update(out, 0, olen)
      val v = crc.getValue.toInt
      target.write((v >>> 24) & 0xff); target.write((v >>> 16) & 0xff)
      target.write((v >>> 8) & 0xff); target.write(v & 0xff)
      compressedPos += olen + 4
      fill = 0
    }

    /** Flushes the tail chunk; returns (uncompressed data length, chunk
      * offsets in the compressed file). */
    def finish(): (Long, Array[Long]) = {
      require(!finished, "finish() called twice")
      finished = true
      flushChunk()
      target.flush()
      (dataLength, offsets.result().toArray)
    }
  }

  /** A seekable byte source (Hadoop FSDataInputStream shape). */
  trait RandomAccess {
    def readFully(position: Long, buf: Array[Byte], off: Int, len: Int): Unit
    def close(): Unit
  }

  /** Serves the UNCOMPRESSED byte stream [startUncompressed, dataLength)
    * by walking the chunk table: seek to the chunk holding the start
    * position, verify its CRC, decompress, skip into it, then stream
    * chunk-by-chunk — `CompressedChunkReader` + `chunkFor` in one. */
  final class ChunkedInputStream(source: RandomAccess,
      info: CompressionInfoFormat.Info, compressedFileLength: Long,
      private var startUncompressed: Long) extends InputStream {
    private val codec = Compressors.byName(info.compressor)
    private val chunkLength = info.chunkLength
    private val nChunks = info.offsets.length
    private val out = new Array[Byte](chunkLength)
    private var compressedBuf = new Array[Byte](chunkLength + 4096)
    private var chunkIdx = (startUncompressed / chunkLength).toInt
    private var pos = 0 // position within the current decompressed chunk
    private var limit = 0 // valid bytes in the current decompressed chunk
    private var primed = false

    private def loadChunk(i: Int): Boolean = {
      if (i >= nChunks) return false
      val begin = info.offsets(i)
      val end =
        if (i + 1 < nChunks) info.offsets(i + 1) else compressedFileLength
      val payload = (end - begin - 4).toInt
      if (payload < 0)
        throw new java.io.IOException(s"corrupt chunk table at chunk $i")
      if (compressedBuf.length < payload + 4)
        compressedBuf = new Array[Byte](payload + 4)
      source.readFully(begin, compressedBuf, 0, payload + 4)
      val crc = new CRC32()
      crc.update(compressedBuf, 0, payload)
      val stored =
        ((compressedBuf(payload) & 0xff) << 24) |
          ((compressedBuf(payload + 1) & 0xff) << 16) |
          ((compressedBuf(payload + 2) & 0xff) << 8) |
          (compressedBuf(payload + 3) & 0xff)
      if (stored != crc.getValue.toInt)
        throw new java.io.IOException(s"chunk $i checksum mismatch")
      val uncompressedLen =
        math.min(chunkLength.toLong, info.dataLength - i.toLong * chunkLength).toInt
      if (payload >= info.maxCompressedLength) {
        // stored raw (compression did not meet min_compress_ratio)
        if (payload != uncompressedLen)
          throw new java.io.IOException(s"raw chunk $i length mismatch")
        System.arraycopy(compressedBuf, 0, out, 0, payload)
      } else {
        codec.decompress(compressedBuf, payload, out, uncompressedLen)
      }
      limit = uncompressedLen
      pos = 0
      true
    }

    /** Reposition the stream at UNCOMPRESSED position `newStart`,
      * REUSING the currently decompressed chunk when `newStart` falls
      * inside it (round 19, the point-read path: consecutive sorted
      * probes overwhelmingly land in the same chunk, and a per-probe
      * stream paid a buffer pair + a chunk decompress each time). A
      * seek outside the loaded chunk just re-arms priming — the next
      * read loads the right chunk through the usual path. */
    def seekTo(newStart: Long): Unit = {
      val i = (newStart / chunkLength).toInt
      if (primed && i == chunkIdx && i < nChunks) {
        val p = (newStart % chunkLength).toInt
        if (p > limit) throw new java.io.IOException(
          s"start $newStart beyond data length ${info.dataLength}")
        pos = p
      } else {
        chunkIdx = i
        startUncompressed = newStart
        primed = false
      }
    }

    private def ensure(): Boolean = {
      if (!primed) {
        primed = true
        if (!loadChunk(chunkIdx)) return false
        pos = (startUncompressed % chunkLength).toInt
        if (pos > limit) throw new java.io.IOException(
          s"start $startUncompressed beyond data length ${info.dataLength}")
      }
      while (pos >= limit) {
        chunkIdx += 1
        if (!loadChunk(chunkIdx)) return false
      }
      true
    }

    override def read(): Int = {
      if (!ensure()) return -1
      val b = out(pos) & 0xff
      pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (!ensure()) return -1
      val n = math.min(len, limit - pos)
      System.arraycopy(out, pos, b, off, n)
      pos += n
      n
    }

    override def close(): Unit = source.close()
  }
}
