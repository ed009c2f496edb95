package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Fixtures, Tables}

/** `pstats` — partition-size statistics from the partition index only
  * (cli/PartitionSizeStatisticsCollector.java). The reference's k-way merge
  * over pre-sorted Index.db readers becomes a hash aggregation on the
  * partition key; its bounded top-N heaps become orderBy().limit(n), which
  * Catalyst plans as TakeOrderedAndProject (same O(N) memory per partition,
  * but distributed). */
object PStats {

  /** F1: collated partitions, optionally restricted to a `-f` sstable set
    * BEFORE the collate — the reference passes the filter into
    * getColumnFamily (ColumnFamilyBackend.java:80-89), so every report
    * section sees only the surviving sstables. The unfiltered form reuses
    * the session-cached collate. */
  private def liParts(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame =
    if (sstables.isEmpty) Fixtures.liPartitions(spark, dir)
    else
      // filtered collations cache per file set (cf. Purge.stats): every -f
      // report derives from one filtered grouping of the shared pscan
      graft.sources.PlanCache.cached(spark,
        s"li_parts|$dir|${sstables.sorted.mkString(",")}")(
        Fixtures.partitions(liPscanF(spark, dir, sstables)))

  private def liPscanF(spark: SparkSession, dir: String,
      sstables: Seq[String]): DataFrame =
    if (sstables.isEmpty) Fixtures.liPscan(spark, dir)
    else Fixtures.liPscan(spark, dir)
      .where(col("sstable_id").isin(sstables: _*))

  /** A6: size + sstable-count distribution over collated partitions
    * (PartitionSizeStatisticsCollector.java:111-126). One row. */
  def sizeDistribution(spark: SparkSession, dir: String): DataFrame = {
    val parts = liParts(spark, dir)
    val aggs = Dist.agg("size") ++ Seq(
      min(col("table_count")).as("table_count_min"),
      max(col("table_count")).as("table_count_max"),
      floor(sum(col("table_count")) * 100 / count(lit(1)))
        .as("table_count_avg_x100"))
    Dist.expand(parts.agg(aggs.head, aggs.tail: _*), "size")
  }

  /** sstablepartitions thresholds (round 16, q214): a partition is
    * reported when it crosses any of these — ≈ the p99 of the fixture
    * corpus, the "large partition" shape the real tool hunts. */
  val PartitionSizeThreshold = 20000L
  val PartitionCellThreshold = 4L
  val PartitionTombstoneThreshold = 3L

  /** `sstablepartitions` (round 16, q214): Cassandra 4.1's operator
    * tool — per sstable, the partitions exceeding the size / cell /
    * tombstone thresholds, each with the dimensions that flagged it
    * (the report an operator reads before deciding which partitions
    * need a data-model fix). PER SSTABLE (pscan grain), like the real
    * tool, which inspects files one by one — not the collated grain
    * pstats reports. One filtered pass over the shared pscan relation;
    * at 100 TB the threshold filter prunes before any ordering. */
  def largePartitions(spark: SparkSession, dir: String): DataFrame =
    Fixtures.liPscan(spark, dir)
      .where(col("size") >= PartitionSizeThreshold ||
        col("cell_count") >= PartitionCellThreshold ||
        col("tombstone_count") >= PartitionTombstoneThreshold)
      .select(col("sstable_id"), col("key"), col("size"),
        col("cell_count"), col("tombstone_count"),
        (col("size") >= PartitionSizeThreshold).as("over_size"),
        (col("cell_count") >= PartitionCellThreshold).as("over_cells"),
        (col("tombstone_count") >= PartitionTombstoneThreshold)
          .as("over_tombstones"))
      .orderBy("sstable_id", "key")

  /** T1/T2: top-N partitions by size, size-desc then key-asc tiebreak
    * (PartitionStatistics.java:13-18). */
  def topBySize(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil): DataFrame =
    liParts(spark, dir, sstables)
      .select("key", "key_formatted", "size", "table_count")
      .orderBy(desc("size"), asc("key"))
      .limit(n)

  /** T1/T2: top-N by sstable count, then size, then key
    * (PartitionStatistics.java:38-44). */
  def topByTableCount(spark: SparkSession, dir: String, n: Int = 10,
      sstables: Seq[String] = Nil): DataFrame =
    liParts(spark, dir, sstables)
      .select("key", "key_formatted", "size", "table_count")
      .orderBy(desc("table_count"), desc("size"), asc("key"))
      .limit(n)

  /** A2/A14: per-sstable section — partition count, avg (integer div) and max
    * partition size (PartitionSizeStatisticsCollector.java:174-186). */
  def sstableSection(spark: SparkSession, dir: String,
      sstables: Seq[String] = Nil): DataFrame = {
    Fixtures.sstableMeta(liPscanF(spark, dir, sstables))
      .select("sstable_id", "partition_count", "avg_partition_size",
        "max_partition_size", "uncompressed_length")
      .orderBy("sstable_id")
  }

  /** F1: the `-f` sstable filename filter (ColumnFamilyBackend.java:80-89)
    * applied before collate — file/partition pruning. The distribution is
    * then computed over the surviving sstables only. */
  def filteredSizeDistribution(spark: SparkSession, dir: String,
      sstables: Seq[String]): DataFrame = {
    val parts = liParts(spark, dir, sstables)
    val aggs = Dist.agg("size") ++ Seq(
      min(col("table_count")).as("table_count_min"),
      max(col("table_count")).as("table_count_max"))
    Dist.expand(parts.agg(aggs.head, aggs.tail: _*), "size")
  }

  /** S4 / §2.5: re-derive partition size from Data.db offset deltas with
    * lead() over (sstable, position) — the window-function form of
    * IndexReader.java:87-98. `derived_size` uses lead(position) with the
    * per-sstable end offset as the default for the last entry, so it must
    * equal the stored size; the query returns per-sstable proof totals. */
  def indexOffsets(spark: SparkSession, dir: String): DataFrame = {
    val idx = Fixtures.indexEntries(Fixtures.liPscan(spark, dir))
    // lead() ordered by key, not position: position is a running sum over
    // key within each sstable, so the order is identical — and the window
    // then shares the (sstable_id, key) sort the running-sum window in
    // indexEntries already established (no second sort). The per-sstable end
    // offset (uncompressedLength in IndexReader.java:96-98) comes from a
    // broadcast-joined micro-aggregate instead of an unbounded-frame window
    // that would buffer every index entry of an sstable.
    val w = Window.partitionBy("sstable_id").orderBy("key")
    // positions are offsets into Data.db starting at 0, so the end offset is
    // simply the sstable's total size — computable from the cached pscan
    // without touching the running-sum window a second time.
    val ends = Fixtures.liPscan(spark, dir)
      .groupBy("sstable_id").agg(sum("size").as("end_offset"))
    idx
      .join(broadcast(ends), "sstable_id")
      .withColumn("derived_size",
        coalesce(lead("position", 1).over(w), col("end_offset")) -
          col("position"))
      .groupBy("sstable_id")
      .agg(
        count(lit(1)).as("entries"),
        sum("derived_size").as("derived_total"),
        sum("size").as("stored_total"),
        sum(when(col("derived_size") =!= col("size"), 1L).otherwise(0L))
          .as("mismatches"))
      .orderBy("sstable_id")
  }

  /** q144: MERGEABLE log-histogram quantile sketch per sstable — the
    * DDSketch/HdrHistogram family at γ=2: a partition size lands in
    * bucket ⌈log2⌉ (= its bit length), so the sketch state is ≤ 64
    * counters per group no matter how many partitions an sstable holds,
    * the merge is count addition (trivially commutative — plain partial
    * aggregation IS the sketch merge), and any quantile reads off the
    * cumulative histogram with ≤ 2× relative error. This is the
    * bounded-state alternative to A3's Vitter reservoir (q42): the
    * reservoir gives exact-sample percentiles but randomized state; the
    * log histogram gives deterministic γ-bounded ones — which is why it
    * can be hash-oracle-checked outright.
    *
    * Estimator (exact integer arithmetic, oracle-replayed): for quantile
    * p‰, rank = ⌈p·n/1000⌉, the first bucket b with cum ≥ rank covers
    * [2^(b−1), 2^b); est = lo + (lo−1)·(rank − cum_before) div cnt_b —
    * linear interpolation on the bucket's integer span. */
  def logQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val hist = Fixtures.liPscan(spark, dir)
      .select(col("sstable_id"), col("size"))
      .withColumn("bucket", length(bin(col("size"))).cast("long"))
      .groupBy("sstable_id", "bucket").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("sstable_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", sum("cnt").over(Window.partitionBy("sstable_id")))
    val qs = Seq(500, 950, 990)
    val picks = qs.map { p =>
      min(when(col("cum") * 1000 >= col("n") * p,
        struct(col("bucket"), col("cum"), col("cnt")))).as(s"b$p")
    }
    val ests = qs.map { p =>
      expr(
        s"""CAST(
              shiftleft(CAST(1 AS BIGINT), CAST(b$p.bucket AS INT) - 1)
              + ((shiftleft(CAST(1 AS BIGINT), CAST(b$p.bucket AS INT) - 1)
                  - 1)
                 * ((($p * n + 999) div 1000) - (b$p.cum - b$p.cnt)))
                div b$p.cnt
            AS BIGINT)""").as(s"p${p}_est")
    }
    cum.groupBy("sstable_id")
      .agg(max("n").as("n0"), picks: _*)
      .withColumnRenamed("n0", "n")
      .select((col("sstable_id") +: col("n") +: ests): _*)
      .orderBy("sstable_id")
  }
}
