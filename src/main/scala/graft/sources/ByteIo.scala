package graft.sources

import java.io.{DataInput, EOFException, InputStream}

/** Unsynchronized byte-level input primitives for the binary codecs
  * (round 19, guide §4: hot-path expression/kernel cost).
  *
  * The sidecar/row codecs parse vints byte-at-a-time through `DataInput`,
  * so each byte's cost is the underlying stream's `read()` — and both
  * `java.io.BufferedInputStream` and `java.io.ByteArrayInputStream` make
  * that a SYNCHRONIZED method: an uncontended monitor op per byte, paid
  * millions of times per scan task (JDK 17 removed biased locking, so the
  * monitor is a real CAS). These classes are the same two abstractions
  * without the monitor:
  *
  *  - [[CountingBufferedInput]] fuses the read buffer with the
  *    consumed-byte counter the split readers poll for range ends — one
  *    final unsynchronized class where the scan previously stacked an
  *    anonymous counting stream over a BufferedInputStream (two virtual
  *    calls + a monitor per byte).
  *  - [[ByteReader]] is a resettable array-backed `DataInput`, reusable
  *    across row bodies / entry payloads so a scan allocates zero stream
  *    objects per row where it previously built a fresh
  *    `DataInputStream(new ByteArrayInputStream(body))` per unfiltered.
  */
final class CountingBufferedInput(under: InputStream, bufSize: Int = 1 << 18)
    extends InputStream {
  private val buf = new Array[Byte](bufSize)
  private var pos = 0
  private var limit = 0

  /** Bytes handed to the caller so far (read-ahead in the buffer does NOT
    * count — the split readers' range checks need parser-consumed bytes,
    * exactly what the old counting-over-buffered stack counted). */
  var consumed = 0L

  /** Refill; returns false at EOF. */
  private def fill(): Boolean = {
    val n = under.read(buf, 0, buf.length)
    pos = 0
    limit = math.max(n, 0)
    n > 0
  }

  override def read(): Int = {
    if (pos >= limit && !fill()) return -1
    consumed += 1
    val b = buf(pos) & 0xff
    pos += 1
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (pos >= limit && !fill()) return -1
    val n = math.min(len, limit - pos)
    System.arraycopy(buf, pos, b, off, n)
    pos += n
    consumed += n
    n
  }

  override def skip(n: Long): Long = {
    if (n <= 0) return 0
    if (pos >= limit && !fill()) return 0
    val k = math.min(n, (limit - pos).toLong)
    pos += k.toInt
    consumed += k
    k
  }

  override def available(): Int = limit - pos

  override def close(): Unit = under.close()
}

/** Resettable, unsynchronized `DataInput` over a byte array slice. One
  * instance serves every row body of a scan: `reset` repoints it, no
  * per-row stream objects. Big-endian multi-byte reads match
  * `DataInputStream`'s exactly. */
final class ByteReader extends DataInput {
  private var buf: Array[Byte] = Array.emptyByteArray
  private var pos = 0
  private var end = 0

  def reset(b: Array[Byte], off: Int, len: Int): ByteReader = {
    buf = b
    pos = off
    end = off + len
    this
  }

  def reset(b: Array[Byte]): ByteReader = reset(b, 0, b.length)

  /** Bytes left — the `ByteArrayInputStream.available()` the body-size
    * cross-checks read. */
  def available: Int = end - pos

  private def need(n: Int): Int = {
    if (end - pos < n) throw new EOFException(s"need $n bytes, have ${end - pos}")
    val p = pos
    pos += n
    p
  }

  override def readFully(b: Array[Byte]): Unit = readFully(b, 0, b.length)

  override def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
    val p = need(len)
    System.arraycopy(buf, p, b, off, len)
  }

  override def skipBytes(n: Int): Int = {
    val k = math.min(n, end - pos)
    pos += k
    k
  }

  override def readBoolean(): Boolean = buf(need(1)) != 0

  override def readByte(): Byte = buf(need(1))

  override def readUnsignedByte(): Int = buf(need(1)) & 0xff

  override def readShort(): Short = {
    val p = need(2)
    (((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff)).toShort
  }

  override def readUnsignedShort(): Int = {
    val p = need(2)
    ((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff)
  }

  override def readChar(): Char = readUnsignedShort().toChar

  override def readInt(): Int = {
    val p = need(4)
    ((buf(p) & 0xff) << 24) | ((buf(p + 1) & 0xff) << 16) |
      ((buf(p + 2) & 0xff) << 8) | (buf(p + 3) & 0xff)
  }

  override def readLong(): Long = {
    val p = need(8)
    ((buf(p) & 0xffL) << 56) | ((buf(p + 1) & 0xffL) << 48) |
      ((buf(p + 2) & 0xffL) << 40) | ((buf(p + 3) & 0xffL) << 32) |
      ((buf(p + 4) & 0xffL) << 24) | ((buf(p + 5) & 0xffL) << 16) |
      ((buf(p + 6) & 0xffL) << 8) | (buf(p + 7) & 0xffL)
  }

  override def readFloat(): Float = java.lang.Float.intBitsToFloat(readInt())

  override def readDouble(): Double =
    java.lang.Double.longBitsToDouble(readLong())

  override def readLine(): String =
    throw new UnsupportedOperationException("readLine")

  override def readUTF(): String = java.io.DataInputStream.readUTF(this)
}
