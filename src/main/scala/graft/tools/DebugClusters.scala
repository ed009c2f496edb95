package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch phase-timing for dupClusters (round-5 perf forensics). */
object DebugClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"rep $rep")
      val dup = graft.ops.Dedup.ngramPairsExact(spark, sfDir)
        .select("id_a", "id_b")
      val ids = dup.select(col("id_a").as("id"))
        .unionByName(dup.select(col("id_b").as("id"))).distinct()
      val adj = dup.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(dup.select(col("id_b").as("src"), col("id_a").as("dst")))
        .unionByName(ids.select(col("id").as("src"), col("id").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("adj materialize")(adj.count())
      var labels = ids.withColumn("label", col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var prevSum = Option.empty[Long]
      var iter = 0
      var done = false
      while (!done && iter < 20) {
        val next = adj
          .join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(min("label").as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val row = t(s"round $iter") {
          next.agg(sum("label")).first()
        }
        val s = if (row.isNullAt(0)) 0L else row.getLong(0)
        labels.unpersist()
        labels = next
        done = prevSum.contains(s)
        prevSum = Some(s)
        iter += 1
      }
      val out = labels
        .join(labels.groupBy("label").agg(count(lit(1)).as("cluster_size")),
          "label")
        .select(col("id").as("doc_id"), col("label").as("cluster_rep"),
          col("cluster_size"))
        .orderBy("doc_id")
      t("final join+sort+checkpoint")(out.localCheckpoint())
      labels.unpersist(); adj.unpersist()
    }
    spark.stop()
  }
}
