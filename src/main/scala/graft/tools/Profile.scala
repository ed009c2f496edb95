package graft.tools

import org.apache.spark.sql.SparkSession

/** Time selected queries repeatedly in one session (plan vs execution). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repsRaw = sys.env.getOrElse("GRAFT_PROF_REPS", "3")
    val reps = repsRaw.toIntOption.getOrElse(
      sys.error(s"GRAFT_PROF_REPS must be an integer, got '$repsRaw'"))
    require(reps > 0, s"GRAFT_PROF_REPS must be positive, got $reps")
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
    // GRAFT_PROF_COLD: comma-separated PlanCache key substrings to
    // invalidate before EVERY rep — reproduces Bench's coldKeys windows
    // (e.g. "cass_p" for the q71/q83 cold binary scans)
    val coldSubs = sys.env.get("GRAFT_PROF_COLD")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        coldSubs.foreach(s =>
          graft.sources.PlanCache.invalidateMatching(spark, s))
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune the aggregate
        // inputs, which would time a hollowed-out plan (same as Bench)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
