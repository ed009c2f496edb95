package graft.sources.crcdb

import java.io.{DataInput, DataOutput}

/** The real Cassandra `CRC.db` component — per-chunk CRC32s of the
  * UNCOMPRESSED Data.db, written by `DataIntegrityMetadata.ChecksumWriter`
  * and validated on read by `ChecksumValidator` (compressed tables don't
  * get one: their integrity lives in the per-chunk CRCs inside Data.db,
  * which [[graft.sources.compressioninfo.ChunkedData]] already verifies).
  *
  * Layout (all big-endian `DataOutput` ints, like the reference writer):
  *
  * {{{
  * chunk_size:int   (crc:int) * ceil(data_length / chunk_size)
  * }}}
  *
  * The chunk size is configuration (Cassandra's
  * `DatabaseDescriptor.getDigestChunkSize`, nominally 64 KiB) and is read
  * back from the component itself, so any stored value parses. */
object CrcDbFormat {

  val Suffix = "-CRC.db"

  /** Fixture/default chunk size: small enough that every fixture scale
    * yields multi-chunk files (the boundary arithmetic is what a
    * one-chunk file would leave untested). */
  val DefaultChunkBytes: Int = 8 << 10

  final case class Crc(chunkBytes: Int, crcs: Vector[Int])

  /** Per-chunk CRC32s of `bytes` — the int-truncated `CRC32.getValue`,
    * exactly what the writer stores. */
  def chunkCrcs(bytes: Array[Byte], chunkBytes: Int): Vector[Int] = {
    require(chunkBytes > 0, s"chunk size must be positive: $chunkBytes")
    val out = Vector.newBuilder[Int]
    var off = 0
    while (off < bytes.length) {
      val n = math.min(chunkBytes, bytes.length - off)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off, n)
      out += crc.getValue.toInt
      off += n
    }
    out.result()
  }

  def write(out: DataOutput, c: Crc): Unit = {
    out.writeInt(c.chunkBytes)
    c.crcs.foreach(out.writeInt)
  }

  /** Parses to end-of-stream (the component has no trailing data). */
  def parse(in: DataInput, lengthBytes: Long): Crc = {
    if (lengthBytes < 4 || (lengthBytes % 4) != 0)
      throw new java.io.IOException(
        s"not a CRC.db component: $lengthBytes bytes")
    val chunkBytes = in.readInt()
    if (chunkBytes <= 0)
      throw new java.io.IOException(s"corrupt CRC.db chunk size: $chunkBytes")
    val n = (lengthBytes / 4 - 1).toInt
    Crc(chunkBytes, Vector.fill(n)(in.readInt()))
  }
}
