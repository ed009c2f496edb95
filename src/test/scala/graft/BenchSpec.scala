package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention classifier (round 11): the hard-coded
  * sink-query exemption list is gone — a window is exempt from the stall
  * arm exactly when its own process kept the cores busy (self-load is
  * workload, not noise), measured, not named. */
class BenchSpec extends AnyFunSuite {

  test("contention classifier: self-saturated stall is workload, " +
      "deprived stall is contention") {
    // hypervisor steal always contaminates, whatever we were doing
    assert(Bench.contendedWindow(0.05, 0.0, 1.0, 1.0))
    // neighbor-shaped: meaningful stall while our own CPU share was low
    // (whatever deprived us kept our threads waiting)
    assert(Bench.contendedWindow(0.0, 0.15, 1.0, 0.2))
    // self-saturated: the SAME stall with ~full self CPU is our own
    // scheduler queue — the sink-family shape, not contention
    assert(!Bench.contendedWindow(0.0, 0.15, 1.0, 0.95))
    // the boundary sits at the published constant
    assert(Bench.contendedWindow(0.0, 0.15, 1.0,
      Bench.SelfSaturatedShare - 0.01))
    assert(!Bench.contendedWindow(0.0, 0.15, 1.0,
      Bench.SelfSaturatedShare))
    // too-short window: the PSI delta is meaningless
    assert(!Bench.contendedWindow(0.0, 0.15, 0.01, 0.2))
    // quiet window
    assert(!Bench.contendedWindow(0.0, 0.02, 1.0, 0.5))
  }

  test("self-CPU share separates a synthetic spin burst from an idle " +
      "wait") {
    val n = Runtime.getRuntime.availableProcessors()
    val (_, busy) = Bench.measureSelfShare {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val threads = (0 until n).map { _ =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x += 1 }
          sink.addAndGet(x)
        })
        t.start(); t
      }
      Thread.sleep(500)
      stop.set(true)
      threads.foreach(_.join())
      assert(sink.get() > 0)
    }
    val (_, idle) = Bench.measureSelfShare(Thread.sleep(500))
    assert(busy > Bench.SelfSaturatedShare,
      s"an all-cores spin burst must read as self-saturated, got $busy")
    assert(idle < 0.3, s"an idle wait must read as low self share, got $idle")
  }
}
