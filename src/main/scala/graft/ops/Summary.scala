package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** `summary` + `sstables` — metadata-only reports (cli/SummaryCollector.java,
  * cli/SSTableMetadataCollector.java). Zero data-file reads in the reference;
  * here a single pass over the derived sstable_meta view. */
object Summary {

  private def meta(spark: SparkSession, dir: String): DataFrame =
    Fixtures.sstableMeta(Fixtures.allPscan(spark, dir))

  /** A11: per-(keyspace, table) rollup — sstable count, disk/uncompressed
    * totals, repaired count/length/max(repairedAt), repair % as
    * floor(repairedLen·100/dataSize) (SummaryCollector.java:41-68). F5
    * repaired-predicate becomes conditional aggregation. */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    meta(spark, dir)
      .groupBy("keyspace", "tbl")
      .agg(
        count(lit(1)).as("sstable_count"),
        sum("disk_length").as("disk_length"),
        sum("uncompressed_length").as("uncompressed_length"),
        sum(when(col("is_repaired"), 1L).otherwise(0L)).as("repaired_count"),
        sum(when(col("is_repaired"), col("uncompressed_length")).otherwise(0L))
          .as("repaired_length"),
        max(when(col("is_repaired"), col("repaired_at_ms")))
          .as("max_repaired_at_ms"))
      .withColumn("repair_pct",
        floor(col("repaired_length") * 100 / col("uncompressed_length")))
      .orderBy("keyspace", "tbl")

  /** S2/T3: one row per SSTable from metadata only
    * (SSTableMetadataCollector.java:39-91), generation-id sort order — the
    * full reference column set: file timestamp, min/max deletion time,
    * estimated keys, avg/max column count and the droppable-tombstone
    * estimate next to the timestamp/length/size fields
    * (SSTableMetadataCollector.java:39-57). */
  def sstablesReport(spark: SparkSession, dir: String): DataFrame =
    meta(spark, dir)
      .where(col("tbl") === "lineitem")
      .select(
        col("sstable_id"), col("level"), col("is_repaired"),
        col("compaction_strategy"),
        col("min_timestamp_us"), col("max_timestamp_us"),
        (col("max_timestamp_us") - col("min_timestamp_us")).as("duration_us"),
        col("file_timestamp_ms"),
        col("min_local_deletion_time_s"), col("max_local_deletion_time_s"),
        col("repaired_at_ms"),
        col("partition_count"), col("estimated_keys"), col("cell_count"),
        col("avg_column_count"), col("max_column_count"),
        col("droppable_tombstone_count"), col("droppable_ratio_x1000"),
        col("uncompressed_length"), col("disk_length"),
        col("max_partition_size"), col("avg_partition_size"))
      .orderBy("sstable_id")

  /** S1/T5: catalog scan — the distinct (keyspace, table) universe, sorted
    * (CassandraBackend.java:43-60). */
  def catalog(spark: SparkSession, dir: String): DataFrame =
    Fixtures.allPscan(spark, dir)
      .select("keyspace", "tbl").distinct()
      .orderBy("keyspace", "tbl")

  /** F9: secondary-index name resolution — a column family named
    * "table.index" stores its data in the BASE table's directory, so lookups
    * resolve to the base name (CassandraBackend.java:70-75). */
  def resolveStore(columnFamily: String): String = {
    val dot = columnFamily.indexOf('.')
    if (dot >= 0) columnFamily.substring(0, dot) else columnFamily
  }

  /** X8: snapshot name generation — "analyse-" + 20 seeded A-Z chars
    * (Util.java:54-64). The reference snapshots for a consistent file set;
    * our inputs are immutable fixtures, so this exists for CLI parity and
    * is deterministic per seed for testability. */
  def snapshotName(seed: Long = System.nanoTime()): String = {
    val r = new scala.util.Random(seed)
    "analyse-" + Seq.fill(20)(('A' + r.nextInt(26)).toChar).mkString
  }

  /** T3: strategy-aware sstable sort order (SSTableMetadataCollector.java:60-69):
    * TWCS sorts by max cell timestamp, LCS by level, default (STCS) by
    * generation id; all with the id tiebreak (T4, Util.java:32-40). */
  def sortColumnsFor(strategy: String): Seq[Column] = strategy match {
    case "TWCS" => Seq(col("max_timestamp_us").asc, col("sstable_id").asc)
    case "LCS" => Seq(col("level").asc, col("sstable_id").asc)
    case _ => Seq(col("sstable_id").asc)
  }

  /** Strategy-order demonstration as checkable data: each sstable's rank
    * under the TWCS, LCS and generation comparators. */
  def strategyOrders(spark: SparkSession, dir: String): DataFrame = {
    val m = meta(spark, dir).where(col("tbl") === "lineitem")
    // single constant bucket: sstable_meta is O(#sstables) rows (the
    // reference holds the whole list in memory too). pmod(level, 1) is a
    // data-derived zero, so the partition spec survives constant folding —
    // foldable keys (keyspace is a literal upstream) get optimized away and
    // WindowExec would plan+warn a global window
    val one = Window.partitionBy(pmod(col("level"), lit(1)))
    m.select(
        col("sstable_id"), col("level"), col("max_timestamp_us"),
        row_number().over(one.orderBy(
          col("max_timestamp_us").asc, col("sstable_id").asc))
          .cast("long").as("twcs_rank"),
        row_number().over(one.orderBy(
          col("level").asc, col("sstable_id").asc))
          .cast("long").as("lcs_rank"),
        row_number().over(one.orderBy(col("sstable_id").asc))
          .cast("long").as("stcs_rank"))
      .orderBy("sstable_id")
  }

  /** q146: SIZE-TIERED COMPACTION what-if — the planner-side report a
    * Cassandra operator reads before kicking a major compaction. Tier =
    * bit length of the sstable's uncompressed size (the power-of-two
    * size-class simplification of STCS's bucket-average rule: same-tier
    * tables are within 2× of each other); a tier holding ≥ minThreshold
    * members is a compaction candidate (STCS's min_threshold default 4),
    * and the droppable-tombstone mass the merge would purge rides along
    * (the purge family's number placed in the compaction planner's
    * frame). One narrow pass over the per-sstable rollup; the grouped
    * frame is O(tables × 64). */
  def stcsWhatIf(spark: SparkSession, dir: String,
      minThreshold: Int = 4): DataFrame =
    graft.sources.Fixtures
      .sstableMeta(graft.sources.Fixtures.allPscan(spark, dir))
      .select(col("tbl"), col("sstable_id"), col("uncompressed_length"),
        col("droppable_tombstone_count"), col("cell_count"))
      .withColumn("tier",
        length(bin(col("uncompressed_length"))).cast("long"))
      .groupBy("tbl", "tier")
      .agg(count(lit(1)).as("sstables"),
        sum("uncompressed_length").as("total_bytes"),
        min("uncompressed_length").as("min_bytes"),
        max("uncompressed_length").as("max_bytes"),
        sum("droppable_tombstone_count").as("droppable_tombstones"),
        sum("cell_count").as("cells"))
      .withColumn("would_compact", col("sstables") >= minThreshold)
      .withColumn("reclaim_x1000",
        floor(col("droppable_tombstones") * 1000 / col("cells")))
      .orderBy("tbl", "tier")
}
