package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one query window (round 19, guide §1/§7):
  * runs a query to the noop sink (optionally cold via GRAFT_PROF_COLD)
  * and prints each completed stage's task count, executor run/CPU time,
  * shuffle bytes and row counts — which arm of the plan the wall goes to.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.add((si.stageId,
          f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"run=${m.executorRunTime / 1e3}%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
          f"gc=${m.jvmGCTime / 1e3}%5.2f " +
          f"in=${m.inputMetrics.recordsRead}%8d " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten}%9d " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead}%9d  ${si.name.take(60)}"))
      }
    })
    val coldSubs = sys.env.get("GRAFT_PROF_COLD")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        coldSubs.foreach(s =>
          graft.sources.PlanCache.invalidateMatching(spark, s))
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"== $name rep $rep wall $sec%.2f s")
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(_._1).foreach(s => println("  " + s._2))
      }
    }
    spark.stop()
  }
}
