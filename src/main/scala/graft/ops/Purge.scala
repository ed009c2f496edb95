package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Fixtures, Tables}

/** `purge` — reclaimable-by-compaction bytes via simulated ("fake")
  * compaction (PurgeStatisticBackend.java:70-257).
  *
  * The reference k-way-merges UnfilteredRowIterators with last-write-wins
  * reconciliation (`UnfilteredRowIterators.merge`, :129) and then drops
  * deletions older than gcBefore (DeletionPurger, :206-209). Spark-first
  * re-expression: LWW reconciliation is a `max(struct(...))` aggregate per
  * (key, clustering, column) cell group — only the winning version of each
  * cell survives the merge — and the purge predicate (F7) drops winners that
  * are tombstones past gc_grace. reclaimable = pre-merge size − merged-purged
  * size (:134-139).
  *
  * Scale note: both levels are hash aggregations with map-side partial
  * combine, so the only full-width shuffle carries one combined row per cell
  * group; no sorted-input requirement, no window sort buffer, AQE handles
  * skewed partitions. A typed-Aggregator form with the same semantics lives
  * in graft.agg.PurgeAggregator (SURVEY §2.10 A12). */
object Purge {

  /** Per-partition purge statistics: key, sstable count, pre-merge size,
    * merged size after LWW + purge, reclaimable bytes.
    *
    * The LWW winner of each (key, clustering, column) cell group is
    * `max(struct(ts, sstable, size, tombstone, ldt))` — struct comparison is
    * lexicographic, so this is exactly the first row of a sort by all five
    * fields desc, without sorting anything: two hash aggregations with
    * map-side partial combine replace the sort-window + re-shuffle. At scale
    * the shuffle carries one pre-combined row per cell group instead of every
    * raw cell, and no partition-wide sort buffer exists to spill.
    * Tiebreaks past (timestamp, sstable) are value-based: the synthetic
    * lineitem has duplicate (orderkey, linenumber) rows, and a tie that
    * survives all of these is identical in every field the purge reads,
    * so the winner choice cannot affect results in either engine. */
  def perPartition(cells: DataFrame,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame = {
    val merged = cells
      .groupBy("key", "clustering", "column_name")
      .agg(
        sum("size_bytes").as("grp_size"),
        max(struct(col("timestamp_us"), col("sstable_id"), col("size_bytes"),
          col("is_tombstone"), col("local_deletion_time_s"))).as("w"))
      .groupBy("key")
      .agg(
        sum("grp_size").as("size"),
        sum(when(!(col("w.is_tombstone") &&
            col("w.local_deletion_time_s") < gcBeforeS),
          col("w.size_bytes")).otherwise(0L)).as("merged_size"))
    // table_count on its own slim branch: distinct (key, sstable) pairs
    // combine map-side before the shuffle, and both join inputs come out of
    // key-partitioned aggregates so the equi-join adds no exchange. This
    // beats a collect_set-per-cell-group set union (array allocation per
    // group) and a countDistinct inside the wide agg (row expansion of the
    // whole cell stream).
    val tableCounts = cells
      .select("key", "sstable_id").distinct()
      .groupBy("key").agg(count(lit(1)).as("table_count"))
    merged.join(tableCounts, "key")
      .withColumn("key_formatted", concat(lit("key-"), col("key")))
      .withColumn("reclaimable", col("size") - col("merged_size"))
  }

  /** Session-cached purge scan: the reference's purge command computes its
    * statistics in ONE merged pass and renders both the top-N and totals
    * sections from it (PurgeStatisticsCollector.java:59-100) — here the
    * shared pass is the persisted per-partition purge frame.
    *
    * F1: the -f filter (PurgeStatisticsCollector.java:44-49) restricts the
    * scan BEFORE the merge (ColumnFamilyBackend.java:80-89) — a cell whose
    * sstable is excluded neither contributes size nor shadows survivors.
    *
    * gcBeforeS mirrors the reference's per-table `now − gc_grace_seconds`
    * (PurgeStatisticBackend.java:47); each cutoff caches its own merge pass
    * (the cutoff changes what the merge itself drops). */
  private def stats(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame = {
    def cells = Fixtures.lineitemCells(Tables.lineitem(spark, dir))
    if (sstables.isEmpty)
      graft.sources.PlanCache.cached(spark, s"purge|$dir|gc$gcBeforeS")(
        perPartition(cells, gcBeforeS))
    else
      // filtered runs cache per file set: a -f session derives every purge
      // report section (top-N, totals) from ONE filtered merge pass, same
      // as the unfiltered path — the key is the sorted set, so distinct
      // filters never alias
      graft.sources.PlanCache.cached(spark,
        s"purge|$dir|gc$gcBeforeS|${sstables.sorted.mkString(",")}")(
        perPartition(cells.where(col("sstable_id").isin(sstables: _*)),
          gcBeforeS))
  }

  /** Top-N by reclaimable, desc size tiebreak (PurgeStatistics.java:14-20). */
  def top(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    stats(spark, dir, sstables, gcBeforeS)
      .select("key", "key_formatted", "table_count", "size", "reclaimable")
      .orderBy(desc("reclaimable"), desc("size"), asc("key"))
      .limit(n)

  /** Report totals (PurgeStatisticsCollector.java:83-100). */
  def totals(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    stats(spark, dir, sstables, gcBeforeS).agg(
      count(lit(1)).as("partition_count"),
      sum(when(col("reclaimable") > 0, 1L).otherwise(0L))
        .as("partitions_with_reclaimable"),
      sum("size").as("total_size"),
      sum("reclaimable").as("total_reclaimable"))
}
