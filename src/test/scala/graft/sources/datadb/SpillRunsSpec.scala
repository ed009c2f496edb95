package graft.sources.datadb

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** The shared writer spill machinery in isolation (round 13): run
  * round-trip, merge totality, and the failure paths the advisor
  * flagged — a consumer that throws MID-MERGE must not leak run-file
  * streams (close() shuts them), and cleanup works even when a run
  * file was already deleted out from under the helper. */
final class SpillRunsSpec extends AnyFunSuite {

  private def newRuns() = new SpillRuns[Long](Ordering.Long,
    (out, v) => out.writeLong(v), in => in.readLong())

  test("spilled runs merge with the in-memory tail into one totally " +
      "ordered stream") {
    val sr = newRuns()
    val buf = ArrayBuffer[Long](5L, 1L, 9L)
    sr.spillRun(buf)
    assert(buf.isEmpty)
    buf ++= Seq(7L, 3L, 8L)
    sr.spillRun(buf)
    buf ++= Seq(2L, 6L)
    buf.sortInPlace()
    val merged = sr.mergedWith(buf.iterator).toSeq
    assert(merged === Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L))
    sr.clearRuns()
    sr.close()
  }

  test("a consumer that throws mid-merge leaks no run streams: close() " +
      "closes every open run file and removes the spill dir") {
    val sr = newRuns()
    val buf = ArrayBuffer[Long]()
    for (base <- 0 until 4) {
      buf ++= (0 until 1000).map(i => (i * 7 + base).toLong)
      sr.spillRun(buf)
    }
    val it = sr.mergedWith(Iterator.empty)
    // consume a prefix — all four run streams are now open mid-merge
    (0 until 100).foreach(_ => it.next())
    assert(sr.openStreams === 4)
    // the downstream kernel fails here; the writer's abort path calls
    // close(), which must close every tracked stream (no fd leak for
    // the JVM's other running tasks) and delete the dir
    sr.close()
    assert(sr.openStreams === 0)
    // after close the helper is inert: no runs survive
    assert(sr.isEmpty)
    assert(sr.mergedWith(Iterator(1L, 2L)).toSeq === Seq(1L, 2L))
    sr.close()
  }

  test("commit-side cleanup survives a run file deleted out from under " +
      "the helper (no DirectoryNotEmptyException path)") {
    val sr = newRuns()
    val buf = ArrayBuffer[Long](3L, 1L)
    sr.spillRun(buf)
    // drain fully so the stream self-closes, then clear + close — the
    // sequence a successful flush + commit performs
    assert(sr.mergedWith(Iterator.empty).toSeq === Seq(1L, 3L))
    sr.clearRuns()
    sr.close()
  }
}
