package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-split fixed-cost probe (round 19, guide §1): scan the same real
  * compressed fixture at several split sizes and report wall + task
  * seconds per configuration — separates decode work (constant across
  * configurations) from per-split setup (linear in split count). */
object SplitCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}
    val path = CassandraDataFixture.ensureFiles(spark, sfDir,
      compressed = true)
    val taskSec = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          taskSec.addAndGet(e.stageInfo.taskMetrics.executorRunTime): Unit
      })
    for (split <- Seq(64L << 20, 4L << 20, 1L << 20, 512L << 10, 128L << 10);
         rep <- 1 to 3) {
      val df = DataDb.cells(spark, path, maxSplitBytes = Some(split),
        format = DataDbScan.FormatCassandra)
      val n = df.rdd.getNumPartitions
      taskSec.set(0L)
      val t0 = System.nanoTime()
      df.selectExpr("sum(size_bytes)", "count(1)").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      // let the listener drain
      Thread.sleep(200)
      val scanTaskSec = taskSec.get() / 1e3
      // the q216 `winners` shape: a wide-key partial aggregate — probes
      // whether the per-split cost depends on the aggregate, not the scan
      taskSec.set(0L)
      val t1 = System.nanoTime()
      df.groupBy("sstable_id", "key", "clustering", "column_name")
        .count().groupBy("sstable_id").count().collect()
      val sec2 = (System.nanoTime() - t1) / 1e9
      Thread.sleep(200)
      println(f"split=${split / 1024}%8d KiB nsplits=$n%3d rep$rep " +
        f"wall=$sec%.2f taskSec=$scanTaskSec%.2f " +
        f"aggWall=$sec2%.2f aggTaskSec=${taskSec.get() / 1e3}%.2f")
    }
    spark.stop()
  }
}
