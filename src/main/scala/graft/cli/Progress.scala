package graft.cli

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.functions.Formatters

/** K2 — the reference's progress sink (ProgressBar.java:50-92) re-expressed
  * on Spark's listener bus: the reference polls its single-threaded reader
  * for bytes-consumed (PartitionReader.java:92-94); a distributed job's
  * equivalent signal is completed tasks over the job's stages.
  *
  * Rendering mirrors the reference's non-interactive branch:
  * `"title (NN%) ETA: <d h m s>"`, final line `"title (100%)"`, each
  * percentage printed once (ProgressBar.java:84-91), ETA =
  * ceil(elapsed/fraction − elapsed) (ProgressBar.java:54-59, X9).
  */
object Progress {

  /** Pure render — unit-tested against the reference's format. */
  def render(title: String, percentage: Int, etaMs: Long): String =
    if (percentage >= 100) s"$title (100%)"
    else s"$title ($percentage%) ETA: ${Formatters.humanReadableDateDiff(etaMs)}"

  /** Interactive-console variant: 30-column █/░ bar
    * (ProgressBar.java:9-10, 64-80); ANSI clear/CR left to the caller. */
  def renderBar(title: String, fraction: Double, etaMs: Long): String = {
    val pct = (fraction * 100).toInt
    if (pct >= 100) s"$title ${"█" * 30} (100%)"
    else {
      val cols = (fraction * 30).toInt
      s"$title ${"█" * cols}${"░" * (30 - cols)} ($pct%) " +
        s"ETA: ${Formatters.humanReadableDateDiff(etaMs)}"
    }
  }

  def etaMs(elapsedMs: Long, fraction: Double): Long =
    if (fraction <= 0d) 0L
    else math.round(math.ceil(elapsedMs / fraction - elapsedMs))

  /** Track an action's task completion on the listener bus, emitting one
    * line per percentage point to `out` (emissions are serialized — the
    * listener bus dispatches asynchronously). The terminal 100% line is
    * only printed when the tracked body succeeds, mirroring the reference's
    * completion-only final line. */
  def track[T](spark: SparkSession, title: String,
      out: String => Unit = Console.out.println(_))(body: => T): T = {
    val total = new AtomicLong(0L)
    val done = new AtomicLong(0L)
    val lastPct = new AtomicLong(-1L)
    val start = System.currentTimeMillis()
    val lock = new Object
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        total.addAndGet(s.stageInfo.numTasks.toLong)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val d = done.incrementAndGet()
        val n = total.get()
        if (n > 0) {
          val frac = d.toDouble / n
          val pct = math.min((frac * 100).toInt, 99) // 100 is success-only
          // each percentage printed once and never backwards (total task
          // count can still grow while stages are being submitted)
          val prev = lastPct.getAndAccumulate(pct.toLong, Math.max(_, _))
          if (pct > prev) lock.synchronized {
            out(render(title, pct,
              etaMs(System.currentTimeMillis() - start, frac)))
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      // drain: the async bus may still hold task-end events for the action
      // that just returned — wait for quiescence before the final line so
      // nothing prints after (bounded; progress lines are best-effort)
      val deadline = System.currentTimeMillis() + 2000
      var snapshot = -1L
      while (snapshot != done.get() && System.currentTimeMillis() < deadline) {
        snapshot = done.get()
        Thread.sleep(50)
      }
      spark.sparkContext.removeSparkListener(listener)
      lock.synchronized { out(render(title, 100, 0L)) }
      result
    } catch {
      case e: Throwable =>
        spark.sparkContext.removeSparkListener(listener)
        throw e
    }
  }
}
