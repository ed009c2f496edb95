package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Purge
import graft.sources.{Fixtures, Tables}

/** Scratch debug main: dump per-key purge stats for oracle diffing. */
object DebugPurge {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Purge.perPartition(Fixtures.lineitemCells(Tables.lineitem(spark, sfDir)))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/purge_perkey")
    spark.stop()
  }
}
