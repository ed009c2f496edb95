package graft.ops

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures
import graft.sources.commitlog.CommitLogFormat
import graft.sources.commitlog.CommitLogFormat.Mutation
import graft.sources.datadb.{DataDb, DataDbScan}

/** The commitlog (write-ahead log) family, executed end to end (round
  * 16) — the one Cassandra lifecycle stage the engine didn't model:
  * what a node logs BEFORE a memtable flush ever produces an sstable.
  * The reference family reads only sstables at rest (the reference
  * repo has no commitlog reader); this extends the same format layer
  * one stage earlier, with the replay semantics `commitlog_archiving`
  * restores depend on.
  *
  *  - **Log.** Every lineitem cell event is one logged mutation in
  *    RAW form (the WAL records what the client wrote — the
  *    representation mapping a Data.db scan applies happens at flush,
  *    not at log time), appended in timestamp order with full-field
  *    tiebreaks. Segments and sync sections cut by the div rule over
  *    the running entry-byte sum ([[CommitLogFormat.SegmentBytes]] /
  *    [[CommitLogFormat.SectionBytes]]), so the DuckDB oracle replays
  *    the exact assignment with one window cumulative sum.
  *  - **Recover (q221).** Segments parse fail-closed (header, marker
  *    chain and per-entry CRCs all verify), mutations reconcile into
  *    memtable state — LWW per (key, clustering, column_name), NO
  *    tombstone purge (recovery keeps deletes; only compaction may
  *    drop them) — and the state flushes through the real sstable
  *    sink. The production scan of the flushed files must then roll
  *    up to exactly the oracle's replayed reconciliation.
  *  - **Point-in-time restore (q223).** The same replay bounded at
  *    [[RestorePointUs]] — `restore_point_in_time`'s contract: every
  *    mutation at or before the point replays, everything after is
  *    discarded, and the flushed state is the bounded reconciliation.
  *
  * Scale shape: a WAL is a per-node sequential artifact — nodes write
  * it; the engine only READS it, one task per segment (bounded files,
  * embarrassingly parallel), then ONE combine-enabled LWW exchange
  * (the same aggregate shape as [[Compaction.mergeWinners]]) into the
  * clustered sink. The fixture writer alone is driver-sequential,
  * exactly like [[graft.sources.datadb.CassandraDataFixture]] — it
  * simulates what a node wrote, it is not the read path. */
object CommitLog {

  /** PITR bound (fixture day 1200): mid-corpus, so both the replayed
    * and the discarded halves are non-trivial. */
  val RestorePointUs: Long = 1200L * 86400000000L

  /** Recovered-flush generations: replay writes sst-(key % shards). */
  private val M = 1000003L

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[String])]()

  private def memoized(spark: SparkSession, key: String)(
      thunk: => String): String = {
    val full = s"${graft.sources.PlanCache.sessionKey(spark)}|$key"
    val slot = memo.synchronized {
      val it = memo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val hit = memo.get(full)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => thunk)
        memo.put(full, (spark, s))
        s
      }
    }
    slot.value
  }

  /** The append order: timestamp first (a WAL is time-ordered), then
    * every other serialized field so the order is total up to exact
    * duplicates (which are byte-identical, hence interchangeable). */
  private val AppendOrder = Seq("timestamp_us", "key", "clustering",
    "column_name", "kind", "ttl_s", "local_deletion_time_s",
    "is_tombstone", "is_expiring", "size_bytes")

  /** Write the corpus WAL under a temp dir (session-memoized): every
    * licell as one mutation, append-ordered, segmented by the div
    * rule. Driver-sequential by design — see the scale note above. */
  def ensureWal(spark: SparkSession, dir: String): String =
    memoized(spark, s"$dir|wal") {
      val out = graft.sources.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft-commitlog")).toString
      val rows = Fixtures.cells(spark, dir)
        .select(AppendOrder.map(col): _*)
        .orderBy(AppendOrder.map(col): _*)
        .collect()
      val segs = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[Mutation]]
      var cum = 0L
      rows.foreach { r =>
        val m = Mutation(r.getLong(1), r.getLong(2), r.getString(3),
          r.getString(4), r.getLong(0), r.getLong(5), r.getLong(6),
          r.getBoolean(7), r.getBoolean(8), r.getLong(9))
        val seg = cum / CommitLogFormat.SegmentBytes
        segs.getOrElseUpdate(seg,
          scala.collection.mutable.ArrayBuffer.empty) += m
        cum += CommitLogFormat.entryLength(m)
      }
      segs.foreach { case (id, entries) =>
        val f = new java.io.File(out, CommitLogFormat.segmentName(id))
        val os = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(f)))
        try CommitLogFormat.writeSegment(os, id, entries.toSeq)
        finally os.close()
      }
      out
    }

  /** Parsed mutations, one task per segment, RAW fields + segment id. */
  def mutations(spark: SparkSession, dir: String): DataFrame = {
    val wal = ensureWal(spark, dir)
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$wal/${CommitLogFormat.NamePrefix}*${CommitLogFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val seg = CommitLogFormat.parseSegment(bytes)
        seg.mutations.map(m => (seg.id, m.key, m.clustering, m.columnName,
          m.kind, m.timestampUs, m.ttlS, m.localDeletionTimeS,
          m.isTombstone, m.isExpiring, m.sizeBytes))
      }
      .toDF("segment", "key", "clustering", "column_name", "kind",
        "timestamp_us", "ttl_s", "local_deletion_time_s",
        "is_tombstone", "is_expiring", "size_bytes")
  }

  /** Per-segment file facts read at parse time (sections, file bytes),
    * one row per segment — O(#segments) driver-scale output. */
  def segmentFacts(spark: SparkSession, dir: String): DataFrame = {
    val wal = ensureWal(spark, dir)
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$wal/${CommitLogFormat.NamePrefix}*${CommitLogFormat.Suffix}")
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .map { case (_, bytes) =>
        val seg = CommitLogFormat.parseSegment(bytes)
        (seg.id, seg.sections.size.toLong, seg.bytes,
          seg.mutations.size.toLong)
      }
      .toDF("segment", "sections", "file_bytes", "parsed_entries")
  }

  /** q222: the per-segment report — entries, sections, file bytes,
    * entry-byte volume, timestamp span and a key digest, every column
    * recomputable by the oracle's windowed replay of the append order
    * and the div-rule cuts. */
  def segments(spark: SparkSession, dir: String): DataFrame = {
    val mu = mutations(spark, dir)
    val entryLen = lit(66L) + length(col("column_name")) +
      length(col("kind"))
    mu.groupBy("segment")
      .agg(
        count(lit(1)).as("entries"),
        sum(entryLen).as("entry_bytes"),
        min("timestamp_us").as("first_ts_us"),
        max("timestamp_us").as("last_ts_us"),
        sum(col("key") % M).as("keys_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"))
      .join(segmentFacts(spark, dir), Seq("segment"))
      .select(col("segment"), col("entries"), col("sections"),
        col("entry_bytes"), col("file_bytes"), col("first_ts_us"),
        col("last_ts_us"), col("keys_sum"), col("tombstones"),
        (col("entries") === col("parsed_entries")).as("crc_verified"))
      .orderBy("segment")
  }

  /** The memtable reconciliation: LWW per (key, clustering,
    * column_name) over SCAN-REPRESENTATION fields (the flush writes
    * what a scan would render: deleted cells carry no TTL and no
    * value; live value length is `size_bytes % 61`), keeping
    * tombstones — recovery never purges. The same one-exchange
    * combine-enabled aggregate as [[Compaction.mergeWinners]]. */
  private def reconcile(mu: DataFrame): DataFrame = {
    val mapped = mu.select(
      col("key"), col("clustering"), col("column_name"), col("kind"),
      col("timestamp_us"),
      when(col("is_tombstone"), -1L).otherwise(col("ttl_s")).as("ttl_s"),
      col("local_deletion_time_s"), col("is_tombstone"), col("is_expiring"),
      when(col("is_tombstone"), 0L).otherwise(col("size_bytes") % 61)
        .as("size_bytes"))
    mapped.groupBy("key", "clustering", "column_name")
      .agg(max(struct(
        col("timestamp_us"), col("size_bytes"), col("is_tombstone"),
        col("local_deletion_time_s"), col("ttl_s"), col("is_expiring"),
        col("kind"))).as("w"))
      .select(col("key"), col("clustering"), col("column_name"),
        col("w.kind").as("kind"),
        col("w.timestamp_us").as("timestamp_us"),
        col("w.ttl_s").as("ttl_s"),
        col("w.local_deletion_time_s").as("local_deletion_time_s"),
        col("w.is_tombstone").as("is_tombstone"),
        col("w.is_expiring").as("is_expiring"),
        col("w.size_bytes").as("size_bytes"))
  }

  /** Replay + flush under a temp dir (session-memoized); `boundUs`
    * (PITR) discards mutations after the restore point at parse-filter
    * time, before the reconcile exchange. */
  private def ensureFlushed(spark: SparkSession, dir: String,
      boundUs: Option[Long]): String =
    memoized(spark, s"$dir|flush|${boundUs.getOrElse(-1L)}") {
      val out = graft.sources.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft-clreplay")).toString
      val mu0 = mutations(spark, dir)
      val mu = boundUs.fold(mu0)(t => mu0.where(col("timestamp_us") <= t))
      val state = reconcile(mu)
      val modelBytes = state
        .agg(sum(lit(Compaction.EventOverheadBytes) + col("size_bytes")))
        .head.getLong(0)
      val shards = Compaction.outputShards(modelBytes)
      state
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

  private def rollup(scan: DataFrame): DataFrame =
    scan.groupBy("sstable_id")
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        countDistinct("key").as("partitions"),
        sum(col("key") % M).as("keys_sum"),
        sum(col("clustering") % M).as("clustering_sum"),
        sum(col("timestamp_us") % M).as("ts_sum"),
        sum(col("ttl_s") % M).as("ttl_sum"),
        sum(col("local_deletion_time_s") % M).as("ldt_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(col("size_bytes") % M).as("value_sum"))
      .orderBy("sstable_id")

  /** q221: full recovery — the flushed files' production re-scan rolls
    * up per shard; the oracle replays log order, CRC-clean parse,
    * LWW reconciliation (no purge) and the shard rule from parquet. */
  def replay(spark: SparkSession, dir: String): DataFrame =
    rollup(recoveredScan(spark, dir, None))

  /** q223: point-in-time restore at [[RestorePointUs]]. */
  def pitr(spark: SparkSession, dir: String): DataFrame =
    rollup(recoveredScan(spark, dir, Some(RestorePointUs)))

  private def recoveredScan(spark: SparkSession, dir: String,
      boundUs: Option[Long]): DataFrame = {
    val outPath = ensureFlushed(spark, dir, boundUs)
    DataDb.cells(spark, outPath, format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
  }
}
