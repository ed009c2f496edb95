package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run one SparkEntry query at an arbitrary SF tier with
  * the formatted plan, surfacing where an ANSI overflow originates. */
object DebugRaw {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = sys.env.getOrElse("SPARK_GRAFT_Q", "q48_purge_from_raw")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.explain("formatted")
    try {
      // two timed runs: the delta exposes one-time costs (codegen, PlanCache
      // materialization) vs steady-state latency — Bench's min-of-two shape
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(s"$q run$i ${(System.nanoTime() - t0) / 1e9}s")
      }
      println(s"$q OK")
    } catch {
      case t: Throwable =>
        println(s"$q FAILED: ${t.getMessage}")
        var c = t.getCause
        while (c != null) { println(s"  cause: ${c.getMessage}"); c = c.getCause }
    }
    spark.stop()
  }
}
