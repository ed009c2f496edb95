package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures
import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** REAL compaction, end to end (round 10): read the real compressed
  * sstable set through the production `format=cassandra` scan, run the
  * LWW merge + gc_grace purge the engine's purge model defines, and
  * WRITE the merged result back as real sstables through the DSv2
  * `sstable-data` sink — then read THAT through the same scan and roll it
  * up. The full circle `read → merge → write → read` over the real codec
  * in one oracle-checked query (q162): a bug in the row codec (either
  * direction), the chunk layer, the LWW order, the purge rule or the
  * writer's distribution surfaces as a hash mismatch.
  *
  * Semantics (the reference's "fake compaction" purge model, made
  * physical): per (key, clustering, column_name) the winner under a
  * TOTAL order on every scan-visible field — (timestamp_us, sstable_id,
  * size, is_tombstone, local_deletion_time, ttl, is_expiring, kind), all
  * DESC — survives; winners that are droppable tombstones
  * (`local_deletion_time_s < gcBefore`) are purged outright. Range
  * markers participate as their own `range:<cl>` column groups (the
  * fixture's single-bound marker model: newest marker wins, purgeable
  * ones drop). The total order makes the merge deterministic even for
  * fully-duplicated events — tie winners are indistinguishable in every
  * surfaced field.
  *
  * Scale shape: ONE shuffle on the merge key (the compaction shuffle —
  * exactly where Cassandra's k-way merge iterator sits), then the sink's
  * own clustered exchange on the output id. The output is sharded
  * `key % N` with N VOLUME-ADAPTIVE (round 11): one real sstable per
  * shard written in parallel — the N-way major compaction a 100 TB table
  * needs, not a single-writer funnel — and N itself sized by target
  * bytes per output, the sizing every real compaction strategy does
  * (a fixed N means one giant file at 100 TB or thousands of splinters
  * at fixture scale). */
object Compaction {

  /** STRATEGY DETECTION off a state's own sidecars (round 16, the
    * unified `compact --plan` verb's dispatch rule — the same move T3's
    * strategy-aware sort makes, grounded in what the files themselves
    * declare): a state with any Statistics.db level > 0 is LEVELED
    * (only LCS stamps levels); a flat state carrying a fully-expired
    * sstable (maxLocalDeletionTime below gcBefore while live files
    * exist) is TIME-WINDOW (whole-file expiry is the state TWCS
    * deployments converge to and the branch only TWCS acts on);
    * everything else plans SIZE-TIERED, Cassandra's default. O(#files)
    * sidecar reads, zero data. */
  def strategyOf(path: String, gcBeforeS: Long): String = {
    val d = new java.io.File(path)
    val stats = Option(d.listFiles((_, n) =>
        n.endsWith(graft.sources.statsdb.CassandraStatsFormat.Suffix)))
      .getOrElse(Array.empty[java.io.File]).toSeq
      .map(f => graft.sources.statsdb.CassandraStatsFormat.parse(
        java.nio.file.Files.readAllBytes(f.toPath)).stats)
    require(stats.nonEmpty, s"no Statistics.db under $path")
    if (stats.exists(_.level > 0)) "LCS"
    else if (stats.exists(_.maxLocalDeletionTimeS < gcBeforeS) &&
        stats.exists(_.maxLocalDeletionTimeS >= gcBeforeS)) "TWCS"
    else "STCS"
  }

  /** Modeled UNCOMPRESSED bytes one scan event contributes to the input
    * volume: a fixed per-event envelope (flags, clustering, deltas,
    * sizes — the row codec's framing) plus the cell's value length
    * (`size_bytes`). The RELATIONAL volume model — rather than the exact
    * on-disk `data_length` the sidecars publish — keeps the shard
    * function replayable by the DuckDB oracle from parquet; at
    * production scale the same function runs off the CompressionInfo.db
    * `data_length` sum (a constant-time driver read, no extra scan) with
    * everything downstream unchanged. */
  val EventOverheadBytes = 32L

  /** Target uncompressed bytes per output sstable. Deliberately small
    * (1 MiB) so fixture tiers exercise MULTI-shard outputs and the
    * count visibly scales between tiers; a real deployment would set
    * gigabytes here (the function, not the constant, is the point). */
  val TargetOutputBytes = 1L << 20

  /** Backstop against degenerate configs, far above any real fan-out a
    * single compaction wants. */
  val MaxOutputShards = 4096L

  /** Volume-adaptive output shard count: enough `TargetOutputBytes`-sized
    * outputs to hold the modeled input volume. Monotone in input bytes,
    * so the spec's two-tier assertion pins scaling, and the DuckDB
    * oracle replays it as `CEIL(SUM(32 + size)/target)`. */
  def outputShards(inputModelBytes: Long): Long =
    math.min(MaxOutputShards, math.max(1L,
      (inputModelBytes + TargetOutputBytes - 1) / TargetOutputBytes))

  /** PRODUCTION sizing input (round 13): the set's total UNCOMPRESSED
    * data volume read from the sidecars alone — CompressionInfo.db's
    * `data_length` for compressed sstables (what Cassandra's
    * `SSTableReader.uncompressedLength()` reports and every real
    * compaction strategy sizes by), the Data.db file length for the
    * uncompressed (CRC) family. O(#files) driver cost, NO scan — at
    * 100 TB the sizing pass reads kilobytes of sidecar instead of the
    * corpus. Measured on the engine's own fixture files the actual
    * encoded volume runs ~1.35x the 32-byte relational model (varint
    * framing, partition/row headers), so the two sizing inputs are
    * deliberately distinct surfaces: the relational model stays the
    * DuckDB-replayable contract for the oracle-checked queries, and this
    * sum is what `sidecarSized = true` compactions (the production
    * default at real scale) feed the SAME `outputShards` function. */
  def sidecarVolumeBytes(dir: String): Long = {
    val d = new java.io.File(dir)
    val datas = Option(d.listFiles((_, n) => n.endsWith("-Data.db")))
      .getOrElse(Array.empty[java.io.File])
    require(datas.nonEmpty, s"no sstables under $dir")
    datas.map { f =>
      val ci = new java.io.File(d,
        f.getName.stripSuffix("-Data.db") + "-CompressionInfo.db")
      if (ci.exists())
        graft.sources.compressioninfo.CompressionInfoFormat
          .parse(java.nio.file.Files.readAllBytes(ci.toPath)).dataLength
      else f.length()
    }.sum
  }

  private val shardsMemo =
    new java.util.HashMap[String, (SparkSession, Slot[Long])]()

  /** Session-memoized shard count per INPUT set: the volume model is a
    * property of the input, not of the gc parameter, so compactions at
    * several cutoffs (q164's two, the CLI's `-g`) share ONE sizing
    * pass instead of re-scanning per cutoff. Entries are swept with
    * their session (the fixture-memo pattern) so closed sessions don't
    * accumulate for the JVM lifetime. The memo lock covers only
    * lookup/sweep/insert; the sizing SCAN runs outside it on the
    * caller's [[Slot]], so distinct inputs size concurrently. */
  def memoizedShards(spark: SparkSession, inPath: String)(
      inputBytes: => Long): Long = {
    val k = s"${graft.sources.PlanCache.sessionKey(spark)}|$inPath"
    val slot = shardsMemo.synchronized {
      sweep(shardsMemo)
      val hit = shardsMemo.get(k)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => outputShards(inputBytes))
        shardsMemo.put(k, (spark, s))
        s
      }
    }
    slot.value
  }

  private def sweep[V](m: java.util.HashMap[String, (SparkSession, V)])
      : Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
  }

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[String])]()

  private val ChkMod = 1000003L

  /** Compact the real-format compressed set of `dir` into
    * [[outputShards]]-many real sstables under a session-memoized temp
    * dir; returns the output directory. The memo lock covers only
    * lookup/sweep/insert — the multi-minute build (fixture generation,
    * sizing scan, merge job, sink write) runs on the caller's [[Slot]],
    * so compactions of DISTINCT dirs/cutoffs/sessions build concurrently
    * while same-key callers still share one build. */
  def ensureCompacted(spark: SparkSession, dir: String,
      gcBeforeS: Long = Fixtures.GcBeforeS,
      sidecarSized: Boolean = false): String = {
    val key = s"${graft.sources.PlanCache.sessionKey(spark)}|$dir|" +
      s"$gcBeforeS|$sidecarSized"
    val slot = memo.synchronized {
      sweep(memo)
      val hit = memo.get(key)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => build(spark, dir, gcBeforeS, sidecarSized))
        memo.put(key, (spark, s))
        s
      }
    }
    slot.value
  }

  private def build(spark: SparkSession, dir: String,
      gcBeforeS: Long, sidecarSized: Boolean): String = {
      val inPath = CassandraDataFixture.ensureFiles(spark, dir,
        compressed = true)
      val out = graft.sources.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft-compaction")).toString
      val ev = DataDb.cells(spark, inPath,
          maxSplitBytes = Some(splitBytes(inPath)),
          format = DataDbScan.FormatCassandra)
        // input generation ids back to the fixture's sst-<n> names so the
        // LWW order's sstable tiebreak matches the oracle's relation
        .withColumn("sstable_id", concat(lit("sst-"),
          (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
            .cast("long") - 1L).cast("string")))
      // size the output fan-out BEFORE the merge plans. Two sizing
      // surfaces: sidecarSized reads the CompressionInfo.db data_length
      // sum at O(#files) driver cost — the production path, no scan —
      // while the default relational model (one pruned single-column
      // pass, memoized per input set so gc variants share it) keeps the
      // count replayable by the DuckDB oracle from parquet
      val shards =
        if (sidecarSized) outputShards(sidecarVolumeBytes(inPath))
        else memoizedShards(spark, inPath)(
          ev.agg(sum(lit(EventOverheadBytes) + col("size_bytes")))
            .head.getLong(0))
      // LWW winner per merge key as a plain AGGREGATE, not a window: the
      // 8-field total order IS the struct's lexicographic order, so
      // max(struct(order cols)) picks exactly the row_number()=1 row of
      // the all-DESC window — with map-side partial aggregation, so the
      // exchange carries one pre-merged winner per merge key per map
      // task instead of every input event. Spark executes struct-max as
      // SortAggregate (struct buffers aren't UnsafeRow-mutable, so
      // HashAggregate can't hold them), but its sorts are over the 3
      // GROUP KEYS only — not the window's full 11-field order — and
      // the combine still happens; the plan spec pins both properties.
      // The struct's fields are ALSO every surviving output field, so no
      // payload needs carrying beside the ordering.
      mergeWinners(ev, gcBeforeS)
        .select(
          concat(lit("sst-"), pmod(col("key"), lit(shards)))
            .as("sstable_id"),
          col("key"), col("clustering"), col("column_name"), col("kind"),
          col("timestamp_us"), col("ttl_s"), col("local_deletion_time_s"),
          col("is_tombstone"), col("is_expiring"), col("size_bytes"))
        .write.format("sstable-data")
        .option("path", out).option("compressed", "true")
        .mode("append").save()
      out
  }

  /** The LWW merge + gc purge as a plain aggregate: per (key, clustering,
    * column_name) the max of the ordering struct survives; droppable
    * tombstone winners purge. Exposed for the deletion-heavy/plan specs. */
  def mergeWinners(ev: DataFrame, gcBeforeS: Long): DataFrame =
    ev.groupBy("key", "clustering", "column_name")
      .agg(max(struct(
        col("timestamp_us"), col("sstable_id"), col("size_bytes"),
        col("is_tombstone"), col("local_deletion_time_s"), col("ttl_s"),
        col("is_expiring"), col("kind"))).as("w"))
      .where(!(col("w.is_tombstone") &&
        col("w.local_deletion_time_s") < gcBeforeS))
      .select(col("key"), col("clustering"), col("column_name"),
        col("w.kind").as("kind"),
        col("w.timestamp_us").as("timestamp_us"),
        col("w.ttl_s").as("ttl_s"),
        col("w.local_deletion_time_s").as("local_deletion_time_s"),
        col("w.is_tombstone").as("is_tombstone"),
        col("w.is_expiring").as("is_expiring"),
        col("w.size_bytes").as("size_bytes"))

  private def splitBytes(path: String): Long = {
    val files = Option(new java.io.File(path)
      .listFiles((_, n) => n.endsWith("-Data.db")))
      .getOrElse(Array.empty[java.io.File])
    math.max(64L << 10, files.foldLeft(0L)((m, f) => math.max(m, f.length)) / 8)
  }

  /** q162: per-output-shard checksum rollup of the compacted sstables,
    * read back through the production scan. No forced split size: the
    * outputs are already [[TargetOutputBytes]]-sized by construction, so
    * one task per file IS the right read grain — sub-file splits here
    * only shred target-sized files into overhead (they cost ~3x at
    * sf0.1 once the fan-out went volume-adaptive). */
  def compactionRoundtrip(spark: SparkSession, dir: String,
      gcBeforeS: Long = Fixtures.GcBeforeS,
      sidecarSized: Boolean = false): DataFrame = {
    val out = ensureCompacted(spark, dir, gcBeforeS, sidecarSized)
    DataDb.cells(spark, out, format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("kind") === "RANGE_TOMBSTONE_MARKER", 1L).otherwise(0L))
          .as("markers"),
        countDistinct("key").as("partitions"),
        sum(col("key") % ChkMod).as("keys_sum"),
        sum(col("clustering") % ChkMod).as("clustering_sum"),
        sum(col("timestamp_us") % ChkMod).as("ts_sum"),
        sum(col("ttl_s") % ChkMod).as("ttl_sum"),
        sum(col("local_deletion_time_s") % ChkMod).as("ldt_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_expiring"), 1L).otherwise(0L)).as("expiring"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("live"),
        sum(col("size_bytes") % ChkMod).as("value_sum"))
      .orderBy("sstable_id")
  }
}

/** Per-key build slot for the session memos: `lazy val` acts as a
  * per-key latch, so a memo's lock covers only lookup/sweep/insert
  * while DISTINCT keys build concurrently and same-key callers share
  * one build. A failed build rethrows to every waiter and re-attempts
  * on the next access (Scala lazy-val semantics). */
private[ops] final class Slot[A](thunk: () => A) {
  lazy val value: A = thunk()
}
