package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence tool for the streaming replays (round 19, guide §1): run a
  * replay query and print each micro-batch's duration breakdown from
  * the captured StreamingQueryProgress — where the fixed per-batch cost
  * actually goes (triggerExecution vs addBatch vs state commit vs
  * walCommit vs getBatch), so optimization targets the measured arm. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // twice: the second run's staging is memoized, so its breakdown is
      // the steady-state window the bench times
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"== $name rep $rep total $sec%.2f s")
        val progress = Option(
          graft.streaming.StreamingStats.lastProgress.get())
          .getOrElse(Array.empty)
        progress.foreach { p =>
          val d = p.durationMs
          def ms(k: String): Long =
            Option(d.get(k)).map(_.longValue).getOrElse(-1L)
          println(f"  batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
            f"trigger=${ms("triggerExecution")}%5d add=${ms("addBatch")}%5d " +
            f"getBatch=${ms("getBatch")}%4d latestOffset=${ms("latestOffset")}%4d " +
            f"walCommit=${ms("walCommit")}%4d commitOffsets=${ms("commitOffsets")}%4d " +
            f"queryPlanning=${ms("queryPlanning")}%4d")
          p.stateOperators.foreach { so =>
            println(s"    state rows=${so.numRowsTotal} " +
              s"commitMs=${so.commitTimeMs} memory=${so.memoryUsedBytes}")
          }
        }
      }
    }
    spark.stop()
  }
}
