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
  * Keying: a per-session UUID — unique for the session's lifetime. An
  * identity hash code would not be: in a long-lived JVM a new session can
  * collide with a stopped one's key and be handed a persisted DataFrame
  * bound to the dead session. A stopped session's entries are also dead
  * weight, so every call sweeps entries whose owning SparkContext has been
  * stopped (cheap: the map holds a handful of derived scans, not data).
  *
  * MEMORY_AND_DISK: derived views are orders of magnitude smaller than the
  * raw input (aggregated per (sstable, partition)), but at 100 TB inputs
  * even those spill — the disk tier keeps the plan valid at any scale.
  */
object PlanCache {
  private val memo = new java.util.HashMap[String, (SparkSession, DataFrame)]()

  /** One UUID per live session OBJECT (weak keys: a dropped session's id is
    * collectable with it). `sessionUUID` itself sits on the classic
    * SparkSession subclass, not the public API type, so we issue our own. */
  private val ids =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def sessionKey(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  private def sweepStopped(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
    }
  }

  /** Reentrancy-safe memoization: cached builds call cached() themselves
    * (liPartitions → liPscan), and ConcurrentHashMap.computeIfAbsent throws
    * "Recursive update" on reentrant modification of the same map — a
    * nondeterministic, bin-collision-dependent failure. A reentrant
    * synchronized block with plain get/put is safe for nested builds. */
  /** Unpersist and drop THIS session's entries whose derived key
    * contains `substring`; returns how many were dropped. The bench's
    * scale probes use this to make a timed window measure the
    * data-proportional REBUILD of a cached derived relation instead of
    * a 64-row cache read (round 16, VERDICT r15 ask #2: the repair
    * family's sf1 ratio was a warm-cache artifact). */
  def invalidateMatching(spark: SparkSession, substring: String): Int =
    memo.synchronized {
      sweepStopped()
      val prefix = s"${sessionKey(spark)}|"
      val it = memo.entrySet().iterator()
      var n = 0
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.startsWith(prefix) &&
            e.getKey.substring(prefix.length).contains(substring)) {
          e.getValue._2.unpersist()
          it.remove()
          n += 1
        }
      }
      n
    }

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      sweepStopped()
      val k = s"${sessionKey(spark)}|$key"
      val hit = memo.get(k)
      if (hit != null) hit._2
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        memo.put(k, (spark, df))
        df
      }
    }
}
