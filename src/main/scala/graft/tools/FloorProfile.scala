package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query FIXED-COST attribution (round 20, VERDICT r19 Next #5):
  * the sf0.1 bench's 249-query loop carries ~0.4–0.6 s of per-query
  * wall that is NOT task work (161 queries answer in under 0.7 s; the
  * 8-core bench ran FASTER than the 32-core one, so the loop is
  * floor-bound, not compute-bound). This tool splits one warm query
  * window into:
  *
  *   - Catalyst phase times from the QueryPlanningTracker (parsing /
  *     analysis / optimization / planning) of the noop write's own
  *     QueryExecution (captured via QueryExecutionListener),
  *   - task-side time: per-stage executorRunTime and an IDEAL span
  *     estimate (runTime / min(tasks, cores)) — what the tasks would
  *     cost if perfectly packed,
  *   - job/stage counts (each job roundtrip pays DAGScheduler +
  *     listener-bus latency; AQE turns every exchange into a job
  *     barrier with a re-optimization in between),
  *   - the residual: wall − phases − ideal task span = scheduling, AQE
  *     re-planning between stages, codegen compile, and commit overhead.
  *
  * Methodology matches Bench (noop sink, warm shared fixtures, reps in
  * one session); run it on q06-class cheap queries to attribute the
  * floor before touching anything (guide §1).
  */
object FloorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val reps = sys.env.getOrElse("GRAFT_PROF_REPS", "3").toInt
    val cores = 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val taskRunMs = new AtomicLong(0)
    val idealSpanMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = e.stageInfo.taskMetrics
        taskRunMs.addAndGet(m.executorRunTime)
        idealSpanMs.addAndGet(
          m.executorRunTime / math.max(1, math.min(e.stageInfo.numTasks, cores)))
        ()
      }
    })
    val phases = new ConcurrentLinkedQueue[(String, Map[String, Long])]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        phases.add((funcName,
          qe.tracker.phases.map { case (k, v) =>
            k -> (v.endTimeMs - v.startTimeMs) }.toMap ++
          Map("execution_total" -> durationNs / 1000000L)))
        ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          error: Exception): Unit = ()
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        jobs.set(0); stages.set(0); taskRunMs.set(0); idealSpanMs.set(0)
        phases.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1e6
        // the listener bus is async; give it a beat to drain
        Thread.sleep(150)
        val ph = {
          import scala.jdk.CollectionConverters._
          phases.asScala.toSeq
        }
        val phaseSums = ph.flatMap(_._2.toSeq).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).sum }
        val phaseStr = phaseSums.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
        println(f"== $name rep $rep wall ${wallMs}%.0f ms | jobs=${jobs.get} " +
          f"stages=${stages.get} taskRun=${taskRunMs.get}ms " +
          f"idealSpan=${idealSpanMs.get}ms | nQE=${ph.size} $phaseStr")
      }
    }
    spark.stop()
  }
}
