package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Fixtures, Tables}

/** `cfstats` — full cell-level statistics from the Data.db scan
  * (cli/ColumnFamilyStatisticsCollector.java). The richest reference
  * pipeline: per-partition collate (A1), 4 distribution histograms (A6–A8),
  * global counters (A9), TTL histogram (A10), 5 bounded top-N heaps (T1/T2)
  * and the per-sstable scan-stats section (A2/A13). */
object CfStats {

  private def cells(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame = {
    val c = Fixtures.lineitemCells(Tables.lineitem(spark, dir))
    if (sstables.isEmpty) c else c.where(col("sstable_id").isin(sstables: _*))
  }

  /** F1: the -f filter restricts the scan BEFORE the collate
    * (ColumnFamilyBackend.java:80-89) so every section reflects it; the
    * unfiltered default-gc form reuses the session-cached collate.
    * gcBeforeS mirrors the reference's per-table `now − gc_grace_seconds`
    * (ColumnFamilyBackend.java:149). */
  private def parts(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    if (sstables.isEmpty && gcBeforeS == Fixtures.GcBeforeS)
      Fixtures.liPartitions(spark, dir)
    else Fixtures.partitions(pscan(spark, dir, sstables, gcBeforeS))

  private def pscan(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame = {
    val p = Fixtures.liPscanAt(spark, dir, gcBeforeS)
    if (sstables.isEmpty) p
    else p.where(col("sstable_id").isin(sstables: _*))
  }

  private def distribution(df: DataFrame, measure: String): DataFrame = {
    val aggs = Dist.agg(measure)
    Dist.expand(df.agg(aggs.head, aggs.tail: _*), measure)
  }

  /** A7: rows-per-partition distribution. */
  def rowsDistribution(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame =
    distribution(parts(spark, dir, sstables), "row_count")

  /** A6 "widest partitions" measure: cells-per-partition distribution. */
  def cellsDistribution(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame =
    distribution(parts(spark, dir, sstables), "cell_count")

  /** A8 + F3: tombstones-per-partition distribution, only over partitions
    * that have tombstones (ColumnFamilyStatisticsCollector.java:125-129). */
  def tombstonesDistribution(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame =
    distribution(parts(spark, dir, sstables).where(col("tombstone_count") > 0),
      "tombstone_count")

  /** T1/T2 WIDE: top-N by cell count, size tiebreak
    * (PartitionStatistics.java:27-33). */
  def topWide(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil): DataFrame =
    parts(spark, dir, sstables)
      .select("key", "key_formatted", "cell_count", "size", "row_count")
      .orderBy(desc("cell_count"), desc("size"), asc("key"))
      .limit(n)

  /** T1/T2 TOMBSTONE + F3. */
  def topTombstones(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    parts(spark, dir, sstables, gcBeforeS)
      .where(col("tombstone_count") > 0)
      .select("key", "key_formatted", "tombstone_count",
        "droppable_tombstone_count", "size")
      .orderBy(desc("tombstone_count"), desc("size"), asc("key"))
      .limit(n)

  /** T1/T2 MOST_DELETED_ROWS + F4
    * (ColumnFamilyStatisticsCollector.java:130-132). */
  def topDeletedRows(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil): DataFrame =
    parts(spark, dir, sstables)
      .where(col("row_delete_count") > 0)
      .select("key", "key_formatted", "row_delete_count", "size")
      .orderBy(desc("row_delete_count"), desc("size"), asc("key"))
      .limit(n)

  /** A10: global TTL histogram — the reference merges per-partition TTL maps
    * (PartitionStatistics.java:132-138); flat cell-level grouping is the
    * shuffle-light equivalent (ttl cardinality is tiny, so this is a
    * near-map-side-only aggregate). -1 = NO_TTL sentinel. */
  def ttlHistogram(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame =
    cells(spark, dir, sstables)
      .where(col("kind") === "CELL")
      .groupBy("ttl_s")
      .agg(count(lit(1)).as("cell_count"))
      .orderBy("ttl_s")

  /** A9: global counters. */
  def totals(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    totalsOf(parts(spark, dir, sstables, gcBeforeS))

  /** A9 over any collated-partitions frame (parquet-fixture- or raw-
    * Data.db-derived — the pipeline is source-agnostic). */
  def totalsOf(parts: DataFrame): DataFrame =
    parts.agg(
      count(lit(1)).as("partition_count"),
      sum("row_count").as("row_count"),
      sum("row_delete_count").as("row_delete_count"),
      sum("cell_count").as("cell_count"),
      sum("tombstone_count").as("tombstone_count"),
      sum("droppable_tombstone_count").as("droppable_tombstone_count"))

  /** A2/A13: per-sstable scan statistics incl. liveness % =
    * floor(liveCells·100/cells) (SSTableStatistics.java:152-154). */
  def sstableStats(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame =
    pscan(spark, dir, sstables, gcBeforeS)
      .groupBy("sstable_id")
      .agg(
        count(lit(1)).as("partition_count"),
        sum("row_count").as("row_count"),
        sum("row_delete_count").as("row_delete_count"),
        sum("cell_count").as("cell_count"),
        sum("live_cell_count").as("live_cell_count"),
        sum("expiring_cell_count").as("expiring_cell_count"),
        sum("counter_cell_count").as("counter_cell_count"),
        sum("tombstone_count").as("tombstone_count"),
        sum("droppable_tombstone_count").as("droppable_tombstone_count"),
        sum("range_tombstone_count").as("range_tombstone_count"))
      .withColumn("liveness_pct",
        floor(col("live_cell_count") * 100 /
          greatest(col("cell_count"), lit(1L))))
      .orderBy("sstable_id")

  /** q158: TTL EXPIRY FORECAST — the capacity-planning view of the TTL
    * histogram (A10): every expiring cell's actual expiry instant is
    * write-time + TTL, bucketed into 30-day windows from the fixture NOW
    * (day 4000), with per-table cumulative byte mass and its ‰ of the
    * table's total expiring bytes — "how much reclaims by when", the
    * number a capacity planner reads before provisioning. Negative
    * windows are already-expired mass a compaction would drop today.
    *
    * Engine-exactness note: the window id shifts by a 30-day-aligned
    * constant before the integer division so the dividend is always
    * nonnegative — truncating division (both engines) IS floor there,
    * where a direct `div` on negative offsets would round toward zero
    * and disagree with intent. One narrow pass + a (tbl, window) agg +
    * a per-table cumulative window over O(windows) rows. */
  def ttlForecast(spark: SparkSession, dir: String): DataFrame = {
    val now = 4000L * 86400L
    val winS = 30L * 86400L
    val shift = 333L * winS // 30-day-aligned, > any past offset in domain
    val exp = Fixtures.allCells(spark, dir)
      .where(col("is_expiring"))
      .withColumn("win", expr(
        s"((timestamp_us div 1000000 + ttl_s) - ${now}L + ${shift}L)" +
          s" div ${winS}L - 333"))
    val w = Window.partitionBy("tbl").orderBy("win")
      .rowsBetween(Window.unboundedPreceding, 0)
    exp.groupBy("tbl", "win")
      .agg(count(lit(1)).as("cells"), sum("size_bytes").as("bytes"))
      .withColumn("cum_bytes", sum("bytes").over(w))
      .withColumn("cum_x1000", floor(col("cum_bytes") * 1000 /
        sum(col("bytes")).over(Window.partitionBy("tbl"))))
      .select(col("tbl"), col("win").as("window_30d"), col("cells"),
        col("bytes"), col("cum_bytes"), col("cum_x1000"))
      .orderBy("tbl", "window_30d")
  }
}
