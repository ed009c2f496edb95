package graft

import java.io.{ByteArrayInputStream, DataInputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ByteReader, CountingBufferedInput}

/** The unsynchronized input primitives the binary codecs decode through
  * (round 19): [[ByteReader]] must match `DataInputStream` bit-for-bit on
  * every DataInput method the codecs call, and [[CountingBufferedInput]]
  * must hand out the exact byte sequence while counting exactly the bytes
  * the caller consumed (the split readers' range checks ride that
  * counter). */
class ByteIoSpec extends AnyFunSuite {

  private def fixture(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("ByteReader matches DataInputStream on every codec-used method") {
    val bytes = fixture(1 << 12, 1L)
    val ref = new DataInputStream(new ByteArrayInputStream(bytes))
    val br = new ByteReader().reset(bytes)
    // interleave the multi-byte reads the codecs use, same order both sides
    (0 until 128).foreach { i =>
      assert(br.readByte() === ref.readByte(), s"readByte #$i")
      assert(br.readUnsignedByte() === ref.readUnsignedByte())
      assert(br.readShort() === ref.readShort())
      assert(br.readUnsignedShort() === ref.readUnsignedShort())
      assert(br.readInt() === ref.readInt())
      assert(br.readLong() === ref.readLong())
      assert(br.readBoolean() === ref.readBoolean())
      val a = new Array[Byte](7)
      val b = new Array[Byte](7)
      br.readFully(a)
      ref.readFully(b)
      assert(a.toSeq === b.toSeq, s"readFully #$i")
      assert(br.skipBytes(3) === ref.skipBytes(3))
    }
    // float/double bit-equality
    val ref2 = new DataInputStream(new ByteArrayInputStream(bytes))
    val br2 = new ByteReader().reset(bytes)
    (0 until 64).foreach { _ =>
      assert(java.lang.Float.floatToRawIntBits(br2.readFloat()) ===
        java.lang.Float.floatToRawIntBits(ref2.readFloat()))
      assert(java.lang.Double.doubleToRawLongBits(br2.readDouble()) ===
        java.lang.Double.doubleToRawLongBits(ref2.readDouble()))
    }
  }

  test("ByteReader readUTF matches DataInputStream and reset() reuses") {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeUTF("lineitem:αβγ")
    d.writeLong(42L)
    val bytes = bos.toByteArray
    val br = new ByteReader().reset(bytes)
    assert(br.readUTF() === "lineitem:αβγ")
    assert(br.readLong() === 42L)
    assert(br.available === 0)
    // reset repoints the SAME instance (the per-row reuse the decode does)
    br.reset(bytes, 0, bytes.length)
    assert(br.readUTF() === "lineitem:αβγ")
  }

  test("ByteReader slice reset bounds reads and throws EOF past the end") {
    val bytes = fixture(64, 2L)
    val br = new ByteReader().reset(bytes, 8, 16)
    assert(br.available === 16)
    assert(br.readLong() === new DataInputStream(
      new ByteArrayInputStream(bytes, 8, 16)).readLong())
    br.readFully(new Array[Byte](8))
    assert(br.available === 0)
    intercept[java.io.EOFException] { br.readByte() }
    // skipBytes past the end is bounded, like ByteArrayInputStream's skip
    val br2 = new ByteReader().reset(bytes, 0, 4)
    assert(br2.skipBytes(100) === 4)
  }

  test("CountingBufferedInput hands out the exact stream and counts consumed") {
    val bytes = fixture(300000, 3L) // multiple buffer fills at size 4096
    val in = new CountingBufferedInput(new ByteArrayInputStream(bytes), 4096)
    val out = new java.io.ByteArrayOutputStream()
    var consumedCheck = 0L
    // alternate single-byte and chunked reads (the vint parser's pattern)
    val r = new java.util.Random(4L)
    var eof = false
    while (!eof) {
      if (r.nextBoolean()) {
        val b = in.read()
        if (b < 0) eof = true
        else { out.write(b); consumedCheck += 1 }
      } else {
        val buf = new Array[Byte](1 + r.nextInt(9000))
        val n = in.read(buf, 0, buf.length)
        if (n < 0) eof = true
        else { out.write(buf, 0, n); consumedCheck += n }
      }
      assert(in.consumed === consumedCheck)
    }
    assert(out.toByteArray.toSeq === bytes.toSeq)
    assert(in.consumed === bytes.length.toLong)
  }

  test("CountingBufferedInput skip counts and EOF behavior") {
    val bytes = fixture(10000, 5L)
    val in = new CountingBufferedInput(new ByteArrayInputStream(bytes), 256)
    var skipped = 0L
    while (skipped < 9000) {
      val s = in.skip(9000 - skipped)
      assert(s > 0)
      skipped += s
    }
    assert(in.consumed === 9000L)
    assert(in.read() === (bytes(9000) & 0xff))
    var n = 0
    while (in.read() >= 0) n += 1
    assert(n === 999)
    assert(in.read() === -1) // EOF is sticky
    assert(in.consumed === 10000L)
  }
}
