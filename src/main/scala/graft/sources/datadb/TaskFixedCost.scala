package graft.sources.datadb

import org.apache.spark.sql.SparkSession

/** Per-task fixed-cost attribution (round 19, guide §1): times the three
  * things every sstable-data split task reconstructs — the Hadoop
  * Configuration rebuilt from shipped entries, the EventStream (sidecar
  * read + Statistics/CompressionInfo parse + stream setup), and a
  * first-event decode — so the per-task floor can be attacked where it
  * actually is. */
object TaskFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = CassandraDataFixture.ensureFiles(spark, sfDir,
      compressed = true)
    val entries = DataDbScan.confEntries(
      spark.sessionState.newHadoopConf())
    println(s"confEntries: ${entries.length}")
    val file = {
      val d = new java.io.File(path)
      d.listFiles((_, n) => n.endsWith(DataDbFormat.Suffix)).head.toString
    }
    def time[T](label: String, n: Int)(f: => T): Unit = {
      // warm once
      f
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"$label%-34s $ms%8.2f ms/op")
    }
    time("Configuration(false)+set all", 50) {
      val c = new org.apache.hadoop.conf.Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    val conf = {
      val c = new org.apache.hadoop.conf.Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
    time("EventStream construct+close", 50) {
      val es = new EventStream(file, 0L, 1L << 20, conf,
        DataDbScan.FormatCassandra)
      es.close()
    }
    time("EventStream + first 100 events", 50) {
      val es = new EventStream(file, 0L, 1L << 20, conf,
        DataDbScan.FormatCassandra)
      try es.events.take(100).foreach(_ => ()) finally es.close()
    }
    spark.stop()
  }
}
