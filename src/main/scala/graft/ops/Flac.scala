package graft.ops

/** REAL FLAC codec (the lossless-audio subset pure-JVM byte code can
  * implement faithfully): "fLaC" magic, STREAMINFO metadata block, frames
  * with the real bit-level header (14-bit sync, UTF-8-style coded frame
  * number, CRC-8), FIXED-predictor subframes of orders 0–2 with
  * Rice-coded residuals (zigzag + unary quotient + k-bit remainder), and
  * the CRC-16 frame footer. Encode and decode are full mirrors: the
  * decoder reconstructs the exact PCM samples through the predictor
  * algebra and verifies both CRCs, so a single flipped bit anywhere is an
  * error, never silent corruption. This moves lossless audio from the
  * FakeDecoder stub to a real codec; Opus (lossy, DSP-bound) remains the
  * stub's only audio occupant.
  *
  * Scope held to what the oracle can replay exactly: mono, 16-bit, one
  * frame, rice partition order 0 — the core compression machinery
  * (prediction + rice entropy coding) is all real. */
object Flac {

  final case class Decoded(sampleRate: Int, nSamples: Int, order: Int,
      sampleSum: Long)

  // deterministic per-id parameters (the oracle replays these)
  def nSamplesOf(id: Long): Int = 256 + (id % 512).toInt
  def orderOf(id: Long): Int = (id % 3).toInt
  def sampleRateOf(id: Long): Int = 8000 + (id % 5).toInt * 8000
  def sampleOf(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7) % 4001) - 2000).toInt

  // ---------------------------------------------------------------- bits

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(v: Long, bits: Int): Unit = {
      var b = bits
      while (b > 0) {
        val take = math.min(8 - nbits, b)
        acc = (acc << take) | ((v >>> (b - take)) & ((1L << take) - 1))
        nbits += take
        b -= take
        if (nbits == 8) { out.write(acc.toInt & 0xff); acc = 0L; nbits = 0 }
      }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { write(0L, 1); i += 1 }
      write(1L, 1)
    }
    def align(): Unit = if (nbits > 0) write(0L, 8 - nbits)
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], private var bytePos: Int) {
    private var bitPos = 0
    def pos: Int = bytePos
    def read(bits: Int): Long = {
      var v = 0L
      var need = bits
      while (need > 0) {
        if (bytePos >= b.length)
          throw new java.io.IOException("truncated FLAC bitstream")
        val avail = 8 - bitPos
        val take = math.min(avail, need)
        val cur = (b(bytePos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | (cur & 0xff)
        bitPos += take
        need -= take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
    def readUnary(): Long = {
      var q = 0L
      while (read(1) == 0L) {
        q += 1
        if (q > (1L << 30)) throw new java.io.IOException("runaway unary")
      }
      q
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  // ---------------------------------------------------------------- crcs

  /** FLAC frame-header CRC-8, poly x^8+x^2+x+1 (0x07), init 0. */
  private def crc8(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        j += 1
      }
      i += 1
    }
    crc
  }

  /** FLAC frame CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0. */
  private def crc16(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= (b(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ predictors

  /** FLAC fixed predictors, orders 0-2: residual e[i] = s[i] - p(s) with
    * p = 0, s[i-1], 2s[i-1]-s[i-2]. */
  private def residual(s: Array[Int], i: Int, order: Int): Long =
    order match {
      case 0 => s(i).toLong
      case 1 => s(i).toLong - s(i - 1)
      case _ => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    }

  private def reconstruct(s: Array[Int], i: Int, order: Int,
      e: Long): Int = (order match {
    case 0 => e
    case 1 => e + s(i - 1)
    case _ => e + 2L * s(i - 1) - s(i - 2)
  }).toInt

  private val RiceParam = 8

  // ---------------------------------------------------------------- encode

  def encode(id: Long): Array[Byte] = {
    val n = nSamplesOf(id)
    val order = orderOf(id)
    val rate = sampleRateOf(id)
    val samples = Array.tabulate(n)(i => sampleOf(id, i))
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-block flag set, type 0, length 34
    val si = new BitWriter
    si.write(n.toLong, 16); si.write(n.toLong, 16) // min/max block size
    si.write(0L, 24); si.write(0L, 24) // min/max frame size (unknown)
    si.write(rate.toLong, 20)
    si.write(0L, 3) // channels - 1 (mono)
    si.write(15L, 5) // bits per sample - 1 (16)
    si.write(n.toLong, 36) // total samples
    val siBytes = si.toBytes ++ new Array[Byte](16) // MD5 unset (zeros)
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)
    // one frame
    val fw = new BitWriter
    fw.write(0x3ffe, 14) // sync
    fw.write(0L, 1) // reserved
    fw.write(0L, 1) // fixed blocksize strategy
    fw.write(7L, 4) // block size: 16-bit value at end of header
    fw.write(0L, 4) // sample rate: from STREAMINFO
    fw.write(0L, 4) // channel assignment: mono
    fw.write(4L, 3) // sample size: 16 bits
    fw.write(0L, 1) // reserved
    fw.write(0L, 8) // coded frame number 0 (UTF-8 single byte)
    fw.write(n.toLong - 1, 16) // blocksize - 1
    val headerSoFar = fw.toBytes // byte-aligned here by construction
    val fw2 = new BitWriter
    fw2.write(crc8(headerSoFar, 0, headerSoFar.length).toLong, 8)
    // subframe header: zero bit, type FIXED|order (0b001000 + order), no
    // wasted bits
    fw2.write(0L, 1); fw2.write(8L + order, 6); fw2.write(0L, 1)
    // warmup samples, raw 16-bit
    (0 until order).foreach(i => fw2.write(samples(i).toLong & 0xffff, 16))
    // residuals: coding method 0 (4-bit rice), partition order 0, one
    // partition with a fixed parameter
    fw2.write(0L, 2); fw2.write(0L, 4); fw2.write(RiceParam.toLong, 4)
    var i = order
    while (i < n) {
      val e = residual(samples, i, order)
      val u = (e << 1) ^ (e >> 63) // zigzag
      fw2.writeUnary(u >>> RiceParam)
      fw2.write(u & ((1L << RiceParam) - 1), RiceParam)
      i += 1
    }
    val body = headerSoFar ++ fw2.toBytes
    out.write(body)
    val c16 = crc16(body, 0, body.length)
    out.write((c16 >>> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  def decode(b: Array[Byte]): Decoded = {
    if (b.length < 4 || new String(b, 0, 4, "US-ASCII") != "fLaC")
      throw new java.io.IOException("not a FLAC stream")
    var off = 4
    var rate = 0; var total = 0L
    var last = false
    // metadata blocks: STREAMINFO parsed, others skipped by length
    while (!last) {
      if (off + 4 > b.length)
        throw new java.io.IOException("truncated metadata header")
      val h = b(off) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      off += 4
      if (off + len > b.length)
        throw new java.io.IOException("truncated metadata block")
      if (typ == 0) {
        val r = new BitReader(b, off)
        r.read(16); r.read(16); r.read(24); r.read(24)
        rate = r.read(20).toInt
        val ch = r.read(3).toInt + 1
        val bps = r.read(5).toInt + 1
        if (ch != 1 || bps != 16)
          throw new java.io.IOException(s"unsupported layout ch=$ch bps=$bps")
        total = r.read(36)
      }
      off += len
    }
    if (rate == 0) throw new java.io.IOException("missing STREAMINFO")
    // one frame
    val frameStart = off
    val r = new BitReader(b, off)
    if (r.read(14) != 0x3ffe) throw new java.io.IOException("bad frame sync")
    r.read(2) // reserved + strategy
    val bsCode = r.read(4).toInt
    if (r.read(4) != 0L) throw new java.io.IOException("rate code unsupported")
    if (r.read(4) != 0L) throw new java.io.IOException("non-mono unsupported")
    if (r.read(3) != 4L) throw new java.io.IOException("non-16-bit")
    r.read(1)
    val fno = r.read(8) // frame number 0 (single-byte UTF-8 form)
    if (fno >= 0x80) throw new java.io.IOException("multi-byte frame number")
    val n = (bsCode match {
      case 6 => r.read(8) + 1
      case 7 => r.read(16) + 1
      case c => throw new java.io.IOException(s"blocksize code $c")
    }).toInt
    val headerEnd = r.pos // byte-aligned by construction
    val storedCrc8 = r.read(8).toInt
    if (storedCrc8 != crc8(b, frameStart, headerEnd))
      throw new java.io.IOException("frame header CRC-8 mismatch")
    // subframe
    if (r.read(1) != 0L) throw new java.io.IOException("subframe pad bit")
    val typ = r.read(6).toInt
    if (typ < 8 || typ > 12)
      throw new java.io.IOException(s"non-FIXED subframe $typ")
    val order = typ - 8
    if (r.read(1) != 0L)
      throw new java.io.IOException("wasted bits unsupported")
    val samples = new Array[Int](n)
    (0 until order).foreach { i =>
      samples(i) = ((r.read(16) << 48) >> 48).toInt // sign-extend 16-bit
    }
    if (r.read(2) != 0L) throw new java.io.IOException("rice method")
    if (r.read(4) != 0L) throw new java.io.IOException("partition order")
    val k = r.read(4).toInt
    var i = order
    while (i < n) {
      val u = (r.readUnary() << k) | r.read(k)
      val e = (u >>> 1) ^ -(u & 1L) // un-zigzag
      samples(i) = reconstruct(samples, i, order, e)
      i += 1
    }
    r.align()
    val bodyEnd = r.pos
    if (bodyEnd + 2 > b.length)
      throw new java.io.IOException("truncated frame footer")
    val storedCrc16 = ((b(bodyEnd) & 0xff) << 8) | (b(bodyEnd + 1) & 0xff)
    if (storedCrc16 != crc16(b, frameStart, bodyEnd))
      throw new java.io.IOException("frame CRC-16 mismatch")
    if (total != n.toLong)
      throw new java.io.IOException("sample count mismatch vs STREAMINFO")
    var sum = 0L
    samples.foreach(sum += _)
    Decoded(rate, n, order, sum)
  }
}
