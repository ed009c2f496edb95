package graft.sources

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
  private val memo = new java.util.HashMap[String, DataFrame]()

  /** Reentrancy-safe memoization: cached builds call cached() themselves
    * (liPartitions → liPscan), and ConcurrentHashMap.computeIfAbsent throws
    * "Recursive update" on reentrant modification of the same map — a
    * nondeterministic, bin-collision-dependent failure. A reentrant
    * synchronized block with plain get/put is safe for nested builds. */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      val k = s"${System.identityHashCode(spark)}|$key"
      val hit = memo.get(k)
      if (hit != null) hit
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        memo.put(k, df)
        df
      }
    }
}
