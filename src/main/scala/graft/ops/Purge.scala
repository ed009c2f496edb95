package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Fixtures, Tables}

/** `purge` — reclaimable-by-compaction bytes via simulated ("fake")
  * compaction (PurgeStatisticBackend.java:70-257).
  *
  * The reference k-way-merges UnfilteredRowIterators with last-write-wins
  * reconciliation (`UnfilteredRowIterators.merge`, :129) and then drops
  * deletions older than gcBefore (DeletionPurger, :206-209). Spark-first
  * re-expression: LWW reconciliation is a row_number() window over
  * (key, clustering, column) ordered by timestamp desc — only the winning
  * version of each cell survives the merge — and the purge predicate (F7)
  * drops winners that are tombstones past gc_grace. reclaimable =
  * pre-merge size − merged-purged size (:134-139).
  *
  * Scale note: the window shuffles once on (key, clustering, column) and the
  * groupBy(key) reuses that partitioning's key prefix; no driver-side state,
  * no sorted-input requirement, AQE handles skewed partitions. */
object Purge {

  /** Per-partition purge statistics: key, sstable count, pre-merge size,
    * merged size after LWW + purge, reclaimable bytes. */
  def perPartition(cells: DataFrame): DataFrame = {
    // tiebreaks past (timestamp, sstable) are value-based: the synthetic
    // lineitem has duplicate (orderkey, linenumber) rows, and a tie that
    // survives all of these is identical in every field the purge reads,
    // so the winner choice cannot affect results in either engine.
    val w = Window.partitionBy("key", "clustering", "column_name")
      .orderBy(desc("timestamp_us"), desc("sstable_id"), desc("size_bytes"),
        desc("is_tombstone"), desc("local_deletion_time_s"))
    cells
      .withColumn("rn", row_number().over(w))
      .groupBy("key")
      .agg(
        countDistinct("sstable_id").as("table_count"),
        sum("size_bytes").as("size"),
        sum(when(col("rn") === 1 &&
          !(col("is_tombstone") &&
            col("local_deletion_time_s") < Fixtures.GcBeforeS),
          col("size_bytes")).otherwise(0L)).as("merged_size"))
      .withColumn("key_formatted", concat(lit("key-"), col("key")))
      .withColumn("reclaimable", col("size") - col("merged_size"))
  }

  private def stats(spark: SparkSession, dir: String): DataFrame =
    perPartition(Fixtures.lineitemCells(Tables.lineitem(spark, dir)))

  /** Top-N by reclaimable, desc size tiebreak (PurgeStatistics.java:14-20). */
  def top(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    stats(spark, dir)
      .select("key", "key_formatted", "table_count", "size", "reclaimable")
      .orderBy(desc("reclaimable"), desc("size"), asc("key"))
      .limit(n)

  /** Report totals (PurgeStatisticsCollector.java:83-100). */
  def totals(spark: SparkSession, dir: String): DataFrame =
    stats(spark, dir).agg(
      count(lit(1)).as("partition_count"),
      sum(when(col("reclaimable") > 0, 1L).otherwise(0L))
        .as("partitions_with_reclaimable"),
      sum("size").as("total_size"),
      sum("reclaimable").as("total_reclaimable"))
}
