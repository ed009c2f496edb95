package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of shared derived DataFrames.
  *
  * The reference computes every report section of a command from ONE
  * streaming pass (ColumnFamilyStatisticsCollector.java:121-141); the Spark
  * analog is persisting the shared derived scan so the 15+ report queries
  * reuse it instead of re-deriving (SURVEY §4: "all reports per table are
  * derivable from ≤ 2 cached scans"). Entries are keyed per SparkSession,
  * so driver-run Verify/Bench sessions each materialize once.
  *
  * MEMORY_AND_DISK: derived views are orders of magnitude smaller than the
  * raw input (aggregated per (sstable, partition)), but at 100 TB inputs
  * even those spill — the disk tier keeps the plan valid at any scale.
  */
object PlanCache {
  private val memo = new ConcurrentHashMap[String, DataFrame]()

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = System.identityHashCode(spark) + "|" + key
    memo.computeIfAbsent(k, new JFunction[String, DataFrame] {
      def apply(unused: String): DataFrame =
        build.persist(StorageLevel.MEMORY_AND_DISK)
    })
  }
}
