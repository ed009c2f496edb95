package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures
import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** LEVELED compaction (Cassandra LCS), executed end to end (round 13) —
  * the second compaction-selection strategy beside q171's size-tiered
  * one, and its semantic COUNTERPART on purge:
  *
  *  - **Layout**: level 0 holds freshly-flushed sstables that may
  *    overlap anything; level 1+ holds runs of NON-OVERLAPPING key
  *    ranges. The level is read from each sstable's own Statistics.db
  *    (where real LCS persists it) and the key ranges from each
  *    Summary.db's first/last-key tail — driver-side O(#files) sidecar
  *    parses, no scan.
  *  - **Selection**: compact ALL of L0 together with exactly the L1
  *    sstables whose [first_key, last_key] range INTERSECTS the L0
  *    span (Cassandra `LeveledCompactionStrategy.getCandidatesFor`);
  *    disjoint L1 sstables pass through untouched.
  *  - **Purge**: the same conservative guard as q171 — a droppable
  *    tombstone survives only if a non-participating sstable holds its
  *    key — but here leveled RANGE-DISJOINTNESS makes the guard
  *    provably empty (non-participants hold disjoint key ranges), so
  *    every droppable tombstone purges. That contrast IS the point of
  *    LCS: because a level's ranges partition the key space, a leveled
  *    compaction owns every copy of the keys it touches and can purge
  *    aggressively where size-tiered compaction must retain. The spec
  *    asserts both the emptiness and the purging.
  *  - **Output**: survivors are re-partitioned by the REPLACED L1
  *    partners' range boundaries — the merged data lands back in L1 as
  *    the same number of non-overlapping ranges, written as real
  *    compressed sstables through the sink and re-read for the rollup.
  *
  * Scale shape: selection is O(#files) sidecar metadata; the merge is
  * one combine-enabled LWW exchange over the participating events; the
  * output boundary assignment is a bounded CASE over partner ranges
  * (driver-built; #partners ≈ 10 in real LCS). The q172 oracle replays
  * layout, selection, merge, purge and the boundary re-partition from
  * parquet. */
object LeveledCompaction {

  /** Output generations for the rewritten L1 ranges start here. */
  val OutGenBase = 910L

  private val ChkMod = 1000003L

  final case class SstMeta(gen: Long, sstableId: String, level: Int,
      firstKey: Long, lastKey: Long)

  /** Driver-side sidecar metadata: level from Statistics.db, key range
    * from Summary.db's first/last tail — O(#files), no scan. */
  def metadata(inPath: String): Seq[SstMeta] = {
    val d = new java.io.File(inPath)
    val bases = Option(d.listFiles((_, n) => n.endsWith("-Data.db")))
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName.stripSuffix("-Data.db")).sorted.toSeq
    require(bases.nonEmpty, s"no sstables under $inPath")
    bases.map { base =>
      val gen = base.split("-")(1).toLong
      val stats = graft.sources.statsdb.CassandraStatsFormat.parse(
        java.nio.file.Files.readAllBytes(
          new java.io.File(d, base + "-Statistics.db").toPath)).stats
      val summary = graft.sources.summarydb.SummaryDbFormat.parse(
        new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(
            new java.io.File(d, base + "-Summary.db")))))
      def be(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
      SstMeta(gen, s"sst-${gen - 1}", stats.level,
        be(summary.firstKey), be(summary.lastKey))
    }
  }

  /** The L0 span and its overlapping L1 partners, from sidecars alone. */
  def selection(inPath: String): (Seq[SstMeta], Seq[SstMeta], Seq[SstMeta]) = {
    val meta = metadata(inPath)
    val l0 = meta.filter(_.level == 0)
    require(l0.nonEmpty, s"no L0 sstables under $inPath")
    val l0Min = l0.map(_.firstKey).min
    val l0Max = l0.map(_.lastKey).max
    val (partners, passthrough) = meta.filter(_.level == 1)
      .partition(m => m.firstKey <= l0Max && m.lastKey >= l0Min)
    require(partners.nonEmpty, s"no overlapping L1 partners under $inPath")
    (l0, partners.sortBy(_.firstKey), passthrough)
  }

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[String])]()

  private def sweep(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
  }

  def ensureCompacted(spark: SparkSession, dir: String,
      gcBeforeS: Long = Fixtures.GcBeforeS): String = {
    val key =
      s"${graft.sources.PlanCache.sessionKey(spark)}|$dir|lcs|$gcBeforeS"
    val slot = memo.synchronized {
      sweep()
      val hit = memo.get(key)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => build(spark, dir, gcBeforeS))
        memo.put(key, (spark, s))
        s
      }
    }
    slot.value
  }

  private def inputEvents(spark: SparkSession, inPath: String): DataFrame =
    DataDb.cells(spark, inPath, format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))

  /** Bounded CASE assigning a key to the index of the partner range it
    * replaces (partners sorted by firstKey; keys past every boundary
    * clamp to the last — merged keys lie inside the partner ranges by
    * construction, the clamp is belt-and-braces). */
  private def outIndex(partners: Seq[SstMeta], key: Column): Column =
    partners.zipWithIndex.init.foldRight(
      lit(partners.length - 1L): Column) { case ((p, i), rest) =>
      when(key <= p.lastKey, i.toLong).otherwise(rest)
    }

  private def build(spark: SparkSession, dir: String,
      gcBeforeS: Long): String = {
    val inPath = CassandraDataFixture.ensureLeveledFiles(spark, dir)
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-leveled-compaction"))
      .toString
    val (l0, partners, passthrough) = selection(inPath)
    val participatingIds = (l0 ++ partners).map(_.sstableId)
    val ev = inputEvents(spark, inPath)
    val participating = ev.where(col("sstable_id")
      .isin(participatingIds: _*))
    // one LWW merge across L0 + partners (they compact TOGETHER)
    val winners = participating
      .groupBy("key", "clustering", "column_name")
      .agg(max(struct(
        col("timestamp_us"), col("sstable_id"), col("size_bytes"),
        col("is_tombstone"), col("local_deletion_time_s"), col("ttl_s"),
        col("is_expiring"), col("kind"))).as("w"))
    // the conservative guard, run for exact semantics — leveled
    // range-disjointness makes it PROVABLY empty (the spec asserts
    // this), so droppable tombstones purge unconditionally here
    val passKeys = ev.where(col("sstable_id")
        .isin(passthrough.map(_.sstableId): _*))
      .select("key").distinct().withColumn("in_pass", lit(true))
    val kept = winners
      .join(passKeys, Seq("key"), "left")
      .where(!(col("w.is_tombstone") &&
        col("w.local_deletion_time_s") < gcBeforeS) ||
        coalesce(col("in_pass"), lit(false)))
    kept.select(
        concat(lit("sst-"),
          (lit(OutGenBase) + outIndex(partners, col("key")))
            .cast("string")).as("sstable_id"),
        col("key"), col("clustering"), col("column_name"),
        col("w.kind").as("kind"),
        col("w.timestamp_us").as("timestamp_us"),
        col("w.ttl_s").as("ttl_s"),
        col("w.local_deletion_time_s").as("local_deletion_time_s"),
        col("w.is_tombstone").as("is_tombstone"),
        col("w.is_expiring").as("is_expiring"),
        col("w.size_bytes").as("size_bytes"))
      .write.format("sstable-data")
      .option("path", out).option("compressed", "true")
      .mode("append").save()
    out
  }

  private def rollup(unit: Column, action: Column,
      df: DataFrame): DataFrame =
    df.groupBy(unit.as("unit"), action.as("action"))
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("kind") === "RANGE_TOMBSTONE_MARKER", 1L)
          .otherwise(0L)).as("markers"),
        countDistinct("key").as("partitions"),
        min("key").as("first_key"),
        max("key").as("last_key"),
        sum(col("key") % ChkMod).as("keys_sum"),
        sum(col("clustering") % ChkMod).as("clustering_sum"),
        sum(col("timestamp_us") % ChkMod).as("ts_sum"),
        sum(col("ttl_s") % ChkMod).as("ttl_sum"),
        sum(col("local_deletion_time_s") % ChkMod).as("ldt_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_expiring"), 1L).otherwise(0L)).as("expiring"),
        sum(col("size_bytes") % ChkMod).as("value_sum"))

  /** q172: merged L1 replacements read back from the real written
    * sstables (unit `L1-new-<i>`), disjoint L1 sstables passed through
    * (unit `sst-<n>`); first/last key per unit pin the range
    * re-partition. */
  def roundtrip(spark: SparkSession, dir: String,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame = {
    val inPath = CassandraDataFixture.ensureLeveledFiles(spark, dir)
    val outPath = ensureCompacted(spark, dir, gcBeforeS)
    val (_, _, passthrough) = selection(inPath)
    val merged = DataDb.cells(spark, outPath,
        format = DataDbScan.FormatCassandra)
      .withColumn("oidx",
        regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L - OutGenBase)
    val pass = inputEvents(spark, inPath)
      .where(col("sstable_id").isin(passthrough.map(_.sstableId): _*))
    rollup(concat(lit("L1-new-"), col("oidx").cast("string")),
        lit("compacted"), merged)
      .unionByName(rollup(col("sstable_id"), lit("passthrough"), pass))
      .orderBy("unit")
  }
}
