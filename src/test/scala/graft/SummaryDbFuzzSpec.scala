package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.summarydb.SummaryDbFormat

/** Fail-closed fuzzing of the Summary.db codec (round 13): the component
  * is reachable from arbitrary files through the `sstable-summary` DSv2,
  * so corrupted or hostile bytes must surface as typed IO errors — never
  * an OOM-scale allocation, a NegativeArraySizeException, or a silent
  * mis-parse. */
final class SummaryDbFuzzSpec extends AnyFunSuite {

  private def roundtripBytes(): Array[Byte] = {
    val entries = (0 until 16).map { i =>
      SummaryDbFormat.Entry(
        java.nio.ByteBuffer.allocate(8).putLong(i * 37L).array(), i * 101L)
    }
    val s = SummaryDbFormat.Summary(4, SummaryDbFormat.BaseSamplingLevel,
      entries.length, entries.toIndexedSeq,
      entries.head.key, entries.last.key)
    val bos = new java.io.ByteArrayOutputStream()
    SummaryDbFormat.write(new java.io.DataOutputStream(bos), s)
    bos.toByteArray
  }

  private def parse(bytes: Array[Byte]): SummaryDbFormat.Summary =
    SummaryDbFormat.parse(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))

  test("the codec round-trips its own write") {
    val s = parse(roundtripBytes())
    assert(s.minIndexInterval === 4)
    assert(s.entries.length === 16)
    assert(s.entries.map(_.position) === (0 until 16).map(_ * 101L))
    assert(java.nio.ByteBuffer.wrap(s.lastKey).getLong === 15 * 37L)
  }

  test("hostile headers fail closed BEFORE allocating: gigabyte " +
      "offheapSize, empty-summary nonzero region, giant tail key") {
    val good = roundtripBytes()
    def withIntAt(off: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).putInt(off, v); b
    }
    def withLongAt(off: Int, v: Long): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).putLong(off, v); b
    }
    // offheapSize (bytes 8..16) claiming ~2 GiB from a ~300-byte file
    intercept[java.io.IOException] {
      parse(withLongAt(8, (1L << 31) - 8))
    }
    // entry count (bytes 4..8) absurd
    intercept[java.io.IOException] { parse(withIntAt(4, Int.MaxValue)) }
    intercept[java.io.IOException] { parse(withIntAt(4, -1)) }
    // n = 0 with a nonzero region size: allocation backed by nothing
    val empty = {
      val b = withIntAt(4, 0)
      java.nio.ByteBuffer.wrap(b).putLong(8, 1L << 20); b
    }
    intercept[java.io.IOException] { parse(empty) }
    // zero/negative header fields
    intercept[java.io.IOException] { parse(withIntAt(0, 0)) }
    intercept[java.io.IOException] { parse(withIntAt(16, -5)) }
  }

  test("seeded byte-flip fuzz: every mutation either parses or throws " +
      "a typed IO error — never OOM or runtime exceptions") {
    val good = roundtripBytes()
    val rnd = new scala.util.Random(20260814L)
    var parsed = 0; var rejected = 0
    for (_ <- 0 until 2000) {
      val b = good.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { parse(b); parsed += 1 }
      catch {
        case _: java.io.IOException => rejected += 1 // includes EOF
        // copyOfRange/wrap bounds on a region the guards admitted —
        // still a typed, bounded failure (no allocation blow-up)
        case _: ArrayIndexOutOfBoundsException => rejected += 1
        case _: IndexOutOfBoundsException => rejected += 1
        case _: IllegalArgumentException => rejected += 1
      }
    }
    // both outcomes must occur (mutations in key bytes parse fine;
    // mutations in the header get rejected)
    assert(parsed > 0, "no mutation parsed — fuzz harness too hostile")
    assert(rejected > 0, "no mutation rejected — guards not engaging")
  }
}
