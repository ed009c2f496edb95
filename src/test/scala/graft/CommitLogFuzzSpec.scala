package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.commitlog.CommitLogFormat
import graft.sources.commitlog.CommitLogFormat.Mutation

/** Fail-closed fuzzing of the commitlog codec (round 16): segments are
  * reachable from arbitrary files through the CDC/recovery paths, so
  * corrupted or hostile bytes must surface as typed errors at the CRC
  * layer that guards them — never a mis-parse the replay would trust.
  * Property-based (deterministic seeds, the PropertiesSpec idiom):
  * arbitrary mutation lists roundtrip byte-exactly, and a flipped byte
  * anywhere in the body is always caught. */
final class CommitLogFuzzSpec extends AnyFunSuite {

  /** Deterministic property loop (scalatestplus-scalacheck is not in
    * the offline cache; PropertiesSpec:15's pattern). */
  private def check[A](gen: Gen[A], runs: Int = 60)(body: A => Unit): Unit =
    (0 until runs).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val asciiStr =
    Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val mutationGen: Gen[Mutation] = for {
    key <- Gen.choose(Long.MinValue, Long.MaxValue)
    clustering <- Gen.choose(Long.MinValue, Long.MaxValue)
    cn <- asciiStr
    kind <- Gen.oneOf("CELL", "RANGE_TOMBSTONE_MARKER")
    ts <- Gen.choose(Long.MinValue, Long.MaxValue)
    ttl <- Gen.choose(-1L, Long.MaxValue)
    ldt <- Gen.choose(0L, Long.MaxValue)
    tomb <- Gen.oneOf(true, false)
    exp <- Gen.oneOf(true, false)
    size <- Gen.choose(0L, Long.MaxValue)
  } yield Mutation(key, clustering, cn, kind, ts, ttl, ldt, tomb, exp,
    size)

  private def write(id: Long, ms: Seq[Mutation]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    CommitLogFormat.writeSegment(new java.io.DataOutputStream(bos), id, ms)
    bos.toByteArray
  }

  test("property: arbitrary mutation lists roundtrip byte-exactly") {
    val caseGen = for {
      id <- Gen.choose(0L, Long.MaxValue)
      ms <- Gen.listOf(mutationGen)
    } yield (id, ms)
    check(caseGen) { case (id, ms) =>
      val bytes = write(id, ms)
      val seg = CommitLogFormat.parseSegment(bytes)
      assert(seg.id === id)
      assert(seg.mutations === ms.toVector)
      assert(seg.bytes === bytes.length.toLong)
      // byte accounting: header + markers + entries is exact
      val entryBytes = ms.map(CommitLogFormat.entryLength(_).toLong).sum
      assert(bytes.length.toLong ===
        18L + 8L * (seg.sections.size + 1) + entryBytes)
    }
  }

  test("property: any single flipped body byte fails closed") {
    val seed = (0 until 64).map(i => Mutation(i.toLong, i % 3L,
      s"c${i % 2}", "CELL", 1000L + i, -1L, 2147483647L,
      isTombstone = false, isExpiring = false, sizeBytes = i % 61L))
    val clean = write(5L, seed)
    val flipGen = for {
      at <- Gen.choose(0, clean.length - 1)
      x <- Gen.choose(1, 255)
    } yield (at, x)
    // the parse either throws at a CRC/structure check or — for the
    // stop marker's `next` field, which no CRC guards by design (the
    // real format CRCs (id, position), not the next pointer) — still
    // returns the identical mutations: a corrupt stop pointer can only
    // truncate, never fabricate
    check(flipGen, runs = 400) { case (at, x) =>
      val b = clean.clone(); b(at) = (b(at) ^ x).toByte
      try {
        val seg = CommitLogFormat.parseSegment(b)
        assert(seg.mutations === seed.toVector,
          s"silent mis-parse after flipping byte $at")
      } catch {
        case _: IllegalArgumentException => () // CRC / structure check
        case _: java.io.IOException => ()      // torn read
        case _: IndexOutOfBoundsException => ()
        case _: NegativeArraySizeException =>
          fail(s"unguarded allocation from byte $at")
      }
    }
  }

  test("truncation at every prefix length fails closed, never clean") {
    val seed = (0 until 32).map(i => Mutation(i.toLong, 0L, "c0", "CELL",
      1000L + i, -1L, 2147483647L, isTombstone = false,
      isExpiring = false, sizeBytes = 7L))
    val clean = write(9L, seed)
    (0 until clean.length).foreach { n =>
      try {
        val seg = CommitLogFormat.parseSegment(clean.take(n))
        fail(s"truncated segment ($n of ${clean.length}) parsed as " +
          s"complete with ${seg.mutations.size} mutations")
      } catch {
        case _: IllegalArgumentException => ()
        case _: java.io.IOException => ()
      }
    }
  }
}
