package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §7 M6c): cfstats-style rolling
  * counters and windowed rollups over the events stream. The reference is
  * batch-only; this is the capability add for continuous ingest — same
  * aggregation expressions as graft.ops.EventsOps so batch results oracle
  * the streaming ones.
  */
object StreamingStats {

  /** The RocksDB state store provider class (round 17, VERDICT r16 ask
    * #3): the 100 TB story for symmetric-join and dedup state is a
    * SPILLABLE store, not the default in-memory HDFS-backed map. Every
    * streaming oracle below starts its query through [[withRocksDb]],
    * so the correctness gate re-proves each hash on the store the
    * scale claim depends on. */
  private[graft] val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** State partition count for the ORACLE REPLAYS (round 19, VERDICT
    * r18 Next #2): a streaming query sizes its state store to
    * `spark.sql.shuffle.partitions` at first start — 32 at bench time —
    * and every micro-batch then pays that many RocksDB opens + commits
    * PER STATEFUL OPERATOR regardless of data volume, while the probes
    * hold a few thousand keys and run ~40 controlled micro-batches
    * across the family (~14% of the whole bench's measured time, almost
    * all fixed store cycles). The replays pin a small count instead:
    * same trajectories, same hashes (hash-partitioned state never
    * changes VALUES, only layout). A production standing query must NOT
    * inherit this — it sizes state to the cluster; this wrapper exists
    * only under the replay starts. */
  private[graft] val ProbeStatePartitions = "4"

  private val ShuffleKey = "spark.sql.shuffle.partitions"

  /** Changelog checkpointing (round 19, guide §1.2 applied to the state
    * store): by default EVERY micro-batch commit of EVERY RocksDB store
    * instance uploads a full snapshot of its state to the checkpoint
    * location — for the replays that is (micro-batches × partitions ×
    * stores-per-operator) snapshot zips of a few-thousand-key state,
    * almost all fixed cost (a stream-stream join alone holds 4 stores
    * per partition). With changelog checkpointing the commit appends
    * only the batch's delta and snapshots move to background
    * maintenance; state CONTENTS, emitted rows and the stateOperators /
    * rocksdb custom metrics the specs assert are unchanged — this is a
    * checkpoint-FORMAT choice, not a semantics one. */
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Pin the RocksDB provider (and the probe-scale state partition
    * count) for the span of `f` and restore the prior values — a
    * streaming query captures both confs at START time into its
    * checkpoint metadata, so wrapping `.start()` is what decides them
    * for the query's whole lifetime. */
  private[graft] def withRocksDb[T](spark: SparkSession)(f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    val prevShuffle = spark.conf.getOption(ShuffleKey)
    val prevChangelog = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ProviderKey, RocksDbProvider)
    spark.conf.set(ShuffleKey, ProbeStatePartitions)
    spark.conf.set(ChangelogKey, "true")
    try f
    finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
      restore(ProviderKey, prev)
      restore(ShuffleKey, prevShuffle)
      restore(ChangelogKey, prevChangelog)
    }
  }

  /** Last explicit checkpoint dir handed to a replay start (test hook:
    * the spec reads the provider back out of the checkpoint's offset
    * metadata — the EXECUTED query's config, not the session's). */
  private[graft] val lastCheckpoint =
    new java.util.concurrent.atomic.AtomicReference[String]()

  /** Most recent replay's progress events (test hook, round 18, VERDICT
    * r17 ask #7): the provider pin alone cannot distinguish RocksDB-held
    * state from a silent fallback that rebuilt an in-memory map — the
    * spec asserts the EXECUTED query's `stateOperators` metrics (rows
    * held, RocksDB-specific custom metrics) off this capture. */
  private[graft] val lastProgress =
    new java.util.concurrent.atomic.AtomicReference[
      Array[org.apache.spark.sql.streaming.StreamingQueryProgress]]()

  /** A fresh checkpoint per run (replays re-run per bench window; a
    * reused checkpoint would resume and emit nothing). */
  private def freshCheckpoint(): String = {
    val d = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-stream-ckpt"))
      .toString
    lastCheckpoint.set(d)
    d
  }

  /** Tumbling 1-hour windowed rollup with a 2-hour watermark for late data.
    * Works on any DataFrame with (ts: timestamp, event_type, value) — batch
    * or streaming source alike (unified Dataset API). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("value_x100"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("events"), col("value_x100"))

  /** Sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("events"))

  case class SessionUpdate(user_id: Long, events: Long, closed: Boolean)

  /** Custom session state via mapGroupsWithState: per-user running event
    * count with a 30-minute processing-time session timeout. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (user: Long, rows: Iterator[(Long, Long)],
            state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            val n = state.getOption.getOrElse(0L)
            state.remove()
            SessionUpdate(user, n, closed = true)
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            state.setTimeoutDuration("30 minutes")
            SessionUpdate(user, n, closed = false)
          }
        })
      .toDF()
  }

  /** File-source streaming entry: `eventsDir` is a directory into which
    * event parquet files arrive (FileStreamSource's contract). */
  def fromEventsDir(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    val ts =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts")
    hourlyCounts(raw.withColumn("ts", ts))
  }

  /** Continuously maintained cfstats totals over the raw-SSTable stream
    * (graft.sources.datadb.DataDbMicroBatchStream): as flushed sstables
    * arrive in the directory, the per-sstable counters update — the
    * reference's "re-run cfstats against a newer snapshot" as one standing
    * query. Same conditional-aggregate expressions as the batch path, so
    * batch results oracle the streaming ones. */
  def liveCfStatsTotals(spark: SparkSession, sstableDir: String,
      format: String = graft.sources.datadb.DataDbScan.FormatGraft)
      : DataFrame =
    cfStatsTotalsOf(
      spark.readStream.format("sstable-data").option("format", format)
        .load(sstableDir))

  /** The per-sstable cfstats counters — one aggregate shared by the
    * standing streaming form and its batch oracle (unified Dataset API:
    * the same expressions fold a stream's state or a batch's rows). */
  def cfStatsTotalsOf(events: DataFrame): DataFrame =
    events
      .groupBy("sstable_id")
      .agg(
        count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("live"),
        sum("size_bytes").as("size"))

  private val cfRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q187 (round 15, VERDICT r14 ask #5): the STANDING cfstats totals —
    * spec-only since round 6 — run over the REAL compressed base set to
    * a complete-mode memory sink until all available sstables are
    * processed, returning the standing per-sstable state. Complete-mode
    * state of commutative counters is batch-deterministic, so the same
    * parquet derivation that oracles the batch counters (q67's per-
    * sstable rollup family) hash-checks the streamed state — the
    * streaming surface's SECOND oracle-checked query, covering the
    * grouped-counter shape where q181 covered the leaf digest. */
  def cfStatsTotalsOnce(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.datadb.CassandraDataFixture
      .ensureFiles(spark, dir, compressed = true)
    val name = s"graft_stream_cfstats_${cfRuns.incrementAndGet()}"
    val src = spark.readStream.format("sstable-data")
      .option("format", graft.sources.datadb.DataDbScan.FormatCassandra)
      .load(path)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    val q = withRocksDb(spark)(cfStatsTotalsOf(src)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name).orderBy("sstable_id")
  }

  /** Continuously maintained ANTI-ENTROPY frontier (round 14): the
    * token-ring leaf digests of [[graft.ops.AntiEntropy]] as one STANDING
    * streaming aggregate over arriving sstables — as flushes land in the
    * directory, each leaf's commutative content digest updates, so the
    * Merkle comparison a repair needs is always current instead of
    * rebuilt per repair (the commutative sum fold is exactly what makes
    * the digest streamable: state is one (count, sum) pair per leaf).
    * The batch digest of the same files oracles the streamed state. */
  def liveLeafDigest(spark: SparkSession, sstableDir: String,
      format: String = graft.sources.datadb.DataDbScan.FormatGraft)
      : DataFrame =
    graft.ops.AntiEntropy.tokenLeafDigest(
      spark.readStream.format("sstable-data").option("format", format)
        .load(sstableDir)
        .withColumn("key", graft.sources.BinaryKeys.beLong(col("key"))))

  private val leafRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q181: run [[liveLeafDigest]] over the REAL compressed base set to a
    * complete-mode memory sink until all available sstables are
    * processed, and return the standing state — per-leaf counts and
    * digests, hash-checked against the same SQL that oracles the batch
    * digest (the first oracle-checked STREAMING query: complete-mode
    * state of a commutative fold is batch-deterministic). */
  def leafDigestOnce(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.datadb.CassandraDataFixture
      .ensureFiles(spark, dir, compressed = true)
    val name = s"graft_stream_leafdigest_${leafRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(liveLeafDigest(spark, path,
        graft.sources.datadb.DataDbScan.FormatCassandra)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name).orderBy("leaf")
  }

  /** Continuously maintained STCS SIZE LADDER (round 15): the per-
    * sstable modeled volume — the input of size-tiered compaction
    * SELECTION — as one standing streaming aggregate over arriving
    * sstables, so "which tier compacts next" is always current instead
    * of recomputed per planning pass. One (sum) per sstable: O(#files)
    * state, forever. */
  def liveTierLadder(spark: SparkSession, sstableDir: String,
      format: String = graft.sources.datadb.DataDbScan.FormatGraft)
      : DataFrame =
    spark.readStream.format("sstable-data").option("format", format)
      .load(sstableDir)
      .groupBy("sstable_id")
      .agg(sum(lit(graft.ops.Compaction.EventOverheadBytes) +
        col("size_bytes")).as("model_bytes"))

  private val tierRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q193: run [[liveTierLadder]] over the real TIERED set to a
    * complete-mode memory sink until all available sstables are
    * processed, then derive tier and selection from the standing state
    * (the driver-side ladder step the batch tier table runs — a
    * streaming query cannot chain a second stateful aggregate, and the
    * ladder is O(#files) coordinator state anyway). `length(bin(x))`
    * IS the bit-length, so the tier rule is the batch `tierOf`
    * bit-for-bit. The streaming surface's THIRD oracle-checked query:
    * the compaction-planning shape, after q181's digest and q187's
    * counters. */
  def tierLadderOnce(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.datadb.CassandraDataFixture
      .ensureTieredFiles(spark, dir)
    val name = s"graft_stream_tiers_${tierRuns.incrementAndGet()}"
    val src = liveTierLadder(spark,
      // the standing state is keyed by the source's raw nb-*-big ids;
      // the tier-table id normalization below runs on the drained
      // memory-sink table AFTER the query finishes (unlike q187, which
      // normalizes on the streaming source itself)
      path, graft.sources.datadb.DataDbScan.FormatCassandra)
    val q = withRocksDb(spark)(src
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    val standing = spark.table(name)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    val t = standing.withColumn("tier",
      length(bin(greatest(
        expr(s"model_bytes div ${graft.ops.MinorCompaction.MinTierBytes}"),
        lit(1L)))).cast("long"))
    val members = t.groupBy("tier")
      .agg(count(lit(1)).as("members"))
    t.join(members, "tier")
      .select(col("sstable_id"), col("model_bytes"), col("tier"),
        (col("members") >= graft.ops.MinorCompaction.MinThreshold)
          .as("selected"))
      .orderBy("sstable_id")
  }

  /** Continuously maintained TWCS WINDOW FRONTIER (round 15, q193's
    * time-window sibling): per-sstable max timestamp and max local
    * deletion time — the two sidecar fields the TWCS cycle decides
    * window assignment and expiry from — as one standing streaming
    * aggregate over arriving sstables. O(#files) state; max is
    * commutative, so complete-mode state is batch-deterministic. */
  def liveWindowFrontier(spark: SparkSession, sstableDir: String,
      format: String = graft.sources.datadb.DataDbScan.FormatGraft)
      : DataFrame =
    spark.readStream.format("sstable-data").option("format", format)
      .load(sstableDir)
      .groupBy("sstable_id")
      .agg(max("timestamp_us").as("max_ts_us"),
        max("local_deletion_time_s").as("max_ldt_s"))

  private val winRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q195: run [[liveWindowFrontier]] over the real TWCS-exec set to a
    * complete-mode memory sink, then derive each sstable's window and
    * expiry verdict from the standing state — continuous compaction
    * planning for the time-window strategy, always current as flushes
    * arrive. The fourth oracle-checked streaming query. */
  def windowFrontierOnce(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.datadb.CassandraDataFixture
      .ensureTwcsExecFiles(spark, dir)
    val name = s"graft_stream_windows_${winRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(liveWindowFrontier(spark, path,
        graft.sources.datadb.DataDbScan.FormatCassandra)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
      .withColumn("win", expr("(max_ts_us div 86400000000) div " +
        s"${graft.ops.TwcsCompaction.WindowDays}"))
      .withColumn("expired",
        col("max_ldt_s") < graft.sources.Fixtures.GcBeforeS)
      .orderBy("sstable_id")
  }

  /** Anchor of the q198 hour grid: 2024-01-01T00:00:00Z in microseconds
    * (the synthetic events table starts minutes after it, so relative
    * hour 0 is the table's first hour at every sf). */
  val WatermarkAnchorUs = 1704067200000000L

  private val wmRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q198 (round 16, VERDICT r15 ask #4): the WATERMARK path under a
    * CONTROLLED ARRIVAL ORDER — the first oracle-checked query whose
    * answer depends on late-data drop/keep decisions rather than a
    * commutative complete-mode fold. Four parquet files are staged
    * into a fresh ingest directory with ascending names AND mtimes, and
    * the standing hourly aggregate consumes them one micro-batch each
    * (`maxFilesPerTrigger=1` under AvailableNow, FileStreamSource's
    * (mtime, path) order):
    *
    *  - **batch 1**: hours [0, 2) of the events table, EXCEPT the
    *    event_id-even slivers of hours 0 and 1;
    *  - **batch 2**: hours [4, 8), plus hour 1's even sliver — LATE but
    *    its window is STILL OPEN (the watermark after batch 1 sits
    *    before hour 0's end), so the rows fold into the open state;
    *  - **batch 3**: hours [8, 10) — advances the watermark past hour
    *    1's end, so hours 0 and 1 EMIT and EVICT at this batch's end
    *    (append mode emits a window exactly once);
    *  - **batch 4**: hours [10, 12), plus hour 0's even sliver — late
    *    AND its window was already emitted, so the rows are DROPPED
    *    (measured Spark semantics: a late row merges into open state
    *    but is undeliverable once its window evicted — eviction
    *    happens at the END of the batch whose start-of-batch watermark
    *    passed the window, which is why the drop needs the dedicated
    *    batch 3 between advance and arrival).
    *
    * The final table is every window whose end ≤ the final watermark
    * (max staged event-time in ms minus 2 h — batch 4's own youngest
    * windows stay open and never emit). The DuckDB oracle replays the
    * whole trajectory — batch assignment, the drop, the keep, and the
    * final-watermark emission frontier — from the same parquet. */
  def watermarkReplayOnce(spark: SparkSession, dir: String): DataFrame = {
    val ingestDir = stagedDir(spark, s"$dir|wm") { ingest =>
      val ev = graft.sources.Tables.events(spark, dir)
        .withColumn("rh",
          expr(s"(unix_micros(ts) - $WatermarkAnchorUs) div 3600000000"))
      val lateIn = col("rh") === 1L && col("event_id") % 2 === 0
      val lateOut = col("rh") === 0L && col("event_id") % 2 === 0
      stageBatches(ingest, Seq(
        ev.where(col("rh").between(0L, 1L) && col("event_id") % 2 === 1),
        ev.where((col("rh") >= 4L && col("rh") < 8L) || lateIn),
        ev.where(col("rh") >= 8L && col("rh") < 10L),
        ev.where((col("rh") >= 10L && col("rh") < 12L) || lateOut))
        .map(_.select(col("ts"), col("event_type"), col("value"))))
    }
    val schema = spark.read.parquet(ingestDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ingestDir)
    val name = s"graft_stream_wm_${wmRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(hourlyCounts(src)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name)
      .select(col("hour_start").cast("long").as("hour_start_s"),
        col("event_type"), col("events"), col("value_x100"))
      .orderBy("hour_start_s", "event_type")
  }

  private val ddRuns = new java.util.concurrent.atomic.AtomicLong()

  private val stageMemo =
    new java.util.HashMap[String, (SparkSession, String)]()

  /** Session-memoized staged ingest directory for the controlled-
    * arrival replays (q198/q208): the staging writes are FIXTURE setup
    * (the same files every time — batch content is a pure function of
    * the corpus), so they memoize like every other fixture build,
    * while each replay still runs its streaming query from scratch
    * (fresh sink, fresh state store) over the staged files. */
  private def stagedDir(spark: SparkSession, key: String)(
      build: java.nio.file.Path => Unit): String =
    stageMemo.synchronized {
      val it = stageMemo.entrySet().iterator()
      while (it.hasNext)
        if (it.next().getValue._1.sparkContext.isStopped) it.remove()
      val full = s"${graft.sources.PlanCache.sessionKey(spark)}|$key"
      val hit = stageMemo.get(full)
      if (hit != null) hit._2
      else {
        val ingest = graft.sources.TempDirs.register(
          java.nio.file.Files.createTempDirectory("graft-stream-stage"))
        build(ingest)
        stageMemo.put(full, (spark, ingest.toString))
        ingest.toString
      }
    }

  /** Write `batches` into `ingest` as one parquet file each, with
    * ascending names AND mtimes (FileStreamSource's (mtime, path)
    * order under maxFilesPerTrigger=1). */
  private def stageBatches(ingest: java.nio.file.Path,
      batches: Seq[DataFrame]): Unit =
    batches.zipWithIndex.foreach { case (b, i) =>
      import java.nio.file.Files
      val tmp = Files.createTempDirectory("graft-stream-stage-part")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Option(tmp.toFile.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part under $tmp"))
      val dest = ingest.resolve(f"arrival-$i%03d.parquet")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(60000L * (i + 1))
      ()
    }

  /** q208 (round 16): `dropDuplicatesWithinWatermark` under a
    * CONTROLLED ARRIVAL ORDER — the second stateful-operator class
    * (keyed dedup state + watermark eviction) put under the oracle,
    * after q198's windowed aggregate. Four staged files consume one
    * micro-batch each (the q198 mechanism); the dedup keys on
    * `event_id` with a 1-hour delay:
    *
    *  - **batch 1**: hours [0, 2) — all emitted, one state row per key;
    *  - **batch 2**: hours [4, 6) PLUS a REPUBLICATION of every hour-0
    *    event at ts+4h (same key, fresh event time — the real-world
    *    duplicate: the same document re-crawled later). The keys'
    *    state is still live — structurally at ANY sf: the batch-2
    *    check watermark is max(batch-1 ts) − 1h < hour 1, every
    *    expiry is ts + 1h ≥ hour 1 — so the duplicates are DROPPED;
    *  - **batch 3**: hours [6, 8) — advances the watermark past every
    *    hour-0 key's state expiry (< hour 6 even if the batch-2
    *    duplicate extended it; the staged hour-7 data puts the
    *    watermark past hour 6), evicting the state;
    *  - **batch 4**: hours [8, 10) PLUS the SAME keys republished at
    *    ts+8h — state gone, so they RE-EMIT (the documented
    *    within-watermark contract: only duplicates arriving within the
    *    delay of a live state row are guaranteed dropped).
    *
    * The trajectory is robust to whether a dropped duplicate extends
    * its state's expiry (both readings evict before batch 4's check).
    * Emitted rows = everything staged except batch 2's republication;
    * the re-emission surfaces at its NEW hour-8 event time. The DuckDB
    * oracle replays the staging arithmetic and the drop/re-emit
    * decisions from the same parquet. */
  def dedupReplayOnce(spark: SparkSession, dir: String): DataFrame = {
    val ingestDir = stagedDir(spark, s"$dir|dd") { ingest =>
      val ev = graft.sources.Tables.events(spark, dir)
        .withColumn("rh",
          expr(s"(unix_micros(ts) - $WatermarkAnchorUs) div 3600000000"))
      val dupKeys = col("rh") === 0L
      def cols(df: DataFrame) =
        df.select(col("ts"), col("event_type"), col("value"),
          col("event_id"))
      stageBatches(ingest, Seq(
        cols(ev.where(col("rh") >= 0L && col("rh") < 2L)),
        cols(ev.where(col("rh") >= 4L && col("rh") < 6L))
          .unionByName(cols(ev.where(dupKeys)
            .withColumn("ts", col("ts") + expr("INTERVAL 4 HOURS")))),
        cols(ev.where(col("rh") >= 6L && col("rh") < 8L)),
        cols(ev.where(col("rh") >= 8L && col("rh") < 10L))
          .unionByName(cols(ev.where(dupKeys)
            .withColumn("ts", col("ts") + expr("INTERVAL 8 HOURS"))))))
    }
    val schema = spark.read.parquet(ingestDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ingestDir)
    val name = s"graft_stream_dd_${ddRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(src
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    lastProgress.set(q.recentProgress)
    spark.table(name)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $WatermarkAnchorUs) div 3600000000"))
      .groupBy("rh", "event_type")
      .agg(count(lit(1)).as("events"),
        sum(col("event_id") % 1000003L).as("id_sum"),
        sum(floor(col("value") * 100).cast("long")).as("value_x100"))
      .orderBy("rh", "event_type")
  }

  private val sjRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q220 (round 16): STREAM-STREAM inner join under a CONTROLLED
    * ARRIVAL ORDER — the third stateful-operator class (symmetric join
    * state on both sides + watermark eviction) put under the oracle,
    * after q198's windowed aggregate and q208's keyed dedup. Two file
    * streams (impressions LEFT, conversions RIGHT) consume one staged
    * file each per micro-batch; the join keys on `event_id` with the
    * event-time constraint `right.ts BETWEEN left.ts AND left.ts +
    * 2h`, both sides watermarked at 1 hour. Every event_id appears at
    * most ONCE per side, so each id joins at most once and the whole
    * trajectory reduces to per-id join-or-drop decisions:
    *
    *  - **batch 1**: left = hours [0, 2) of the events table; right =
    *    their EVEN ids at ts+30m — same-batch arrivals match
    *    (new×new), the even cohort emits with a 30-minute lag;
    *  - **batch 2**: left = filler hours [4,6) (ids offset +1e9, never
    *    matching); right = the ids ≡ 1 (mod 4) at ts+90m — LATE but
    *    the left state is still live (the global watermark — the MIN
    *    of both sides' — sits at ~0h), so the cohort emits with a
    *    90-minute lag;
    *  - **batches 3-4**: filler hours [8,14) on BOTH sides (right
    *    offset +2e9) — batch 4's CLOSING watermark (~9h, from batch
    *    3's data) passes every [0,2) left row's retention bound
    *    (ts + 2h);
    *  - **batch 5**: filler hours [12,14)/[14,16) — the batch that
    *    RUNS with watermark ~9h and so actually REMOVES the [0,2)
    *    left state (measured semantics, and the reason the probe
    *    needs its own later batch: a batch joins its inputs against
    *    state FIRST and removes expired state at its END, and
    *    removal uses the PREVIOUS batch's closing watermark — so a
    *    probe in the removal batch itself would still match);
    *  - **batch 6**: right = the ids ≡ 3 (mod 4) at ts+90m — the
    *    SAME lateness batch 2 emitted, but the matching state is
    *    gone (and stream-stream joins never late-filter inputs:
    *    the decision is purely state presence — also measured), so
    *    the cohort produces NOTHING.
    *
    * Emitted = hours [0, 2) ids with id%2=0 (lag 30) or id%4=1 (90);
    * the ≡3 cohort is dropped. The DuckDB oracle replays cohort
    * membership and the per-cohort lag from the same parquet; the
    * lag_min_sum column proves WHICH arrival joined each id. */
  def streamJoinReplayOnce(spark: SparkSession, dir: String): DataFrame = {
    def ev = graft.sources.Tables.events(spark, dir)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $WatermarkAnchorUs) div 3600000000"))
    def cols(df: DataFrame) =
      df.select(col("ts"), col("event_type"), col("value"),
        col("event_id"))
    val leftDir = stagedDir(spark, s"$dir|sj-left") { ingest =>
      stageBatches(ingest, Seq(
        cols(ev.where(col("rh").between(0L, 1L))),
        cols(ev.where(col("rh") >= 4L && col("rh") < 6L)
          .withColumn("event_id", col("event_id") + 1000000000L)),
        cols(ev.where(col("rh") >= 8L && col("rh") < 10L)
          .withColumn("event_id", col("event_id") + 1000000000L)),
        cols(ev.where(col("rh") >= 10L && col("rh") < 12L)
          .withColumn("event_id", col("event_id") + 1000000000L)),
        cols(ev.where(col("rh") >= 12L && col("rh") < 14L)
          .withColumn("event_id", col("event_id") + 1000000000L)),
        cols(ev.where(col("rh") >= 14L && col("rh") < 16L)
          .withColumn("event_id", col("event_id") + 1000000000L))))
    }
    val rightDir = stagedDir(spark, s"$dir|sj-right") { ingest =>
      val h0 = ev.where(col("rh").between(0L, 1L))
      stageBatches(ingest, Seq(
        cols(h0.where(col("event_id") % 2 === 0)
          .withColumn("ts", col("ts") + expr("INTERVAL 30 MINUTES"))),
        cols(h0.where(col("event_id") % 4 === 1)
          .withColumn("ts", col("ts") + expr("INTERVAL 90 MINUTES"))),
        cols(ev.where(col("rh") >= 8L && col("rh") < 10L)
          .withColumn("event_id", col("event_id") + 2000000000L)),
        cols(ev.where(col("rh") >= 10L && col("rh") < 12L)
          .withColumn("event_id", col("event_id") + 2000000000L)),
        cols(ev.where(col("rh") >= 12L && col("rh") < 14L)
          .withColumn("event_id", col("event_id") + 2000000000L)),
        cols(h0.where(col("event_id") % 4 === 3)
          .withColumn("ts", col("ts") + expr("INTERVAL 90 MINUTES")))))
    }
    val schema = spark.read.parquet(leftDir).schema
    def src(d: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val left = src(leftDir).withWatermark("ts", "1 hour")
      .select(col("ts").as("l_ts"), col("event_type"),
        col("event_id"))
    val right = src(rightDir).withWatermark("ts", "1 hour")
      .select(col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    val name = s"graft_stream_sj_${sjRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(left.join(right,
        col("event_id") === col("r_event_id") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 2 HOURS"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    lastProgress.set(q.recentProgress)
    spark.table(name)
      .groupBy("event_type")
      .agg(count(lit(1)).as("events"),
        sum(col("event_id") % 1000003L).as("id_sum"),
        sum(((unix_micros(col("r_ts")) - unix_micros(col("l_ts"))) /
          lit(60000000L)).cast("long")).as("lag_min_sum"))
      .orderBy("event_type")
  }

  /** One output row per (key, micro-batch the key appears in) for the
    * q215 transformWithState replay. */
  final case class TwsRunning(event_type: String, seq: Long,
      events: Long, running_events: Long, id_sum: Long)

  /** The q215 StatefulProcessor: per event type, a ValueState carrying
    * (running event total, appearance count); each micro-batch the key
    * appears in emits ONE row with the batch's own count + id checksum
    * and the post-batch running total. Order-insensitive within the
    * batch (sums only), so the emitted rows are deterministic under a
    * controlled file-per-batch arrival. */
  final class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), TwsRunning] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TwsRunning] = {
      var n = 0L
      var idSum = 0L
      rows.foreach { r =>
        n += 1
        idSum = (idSum + r._2 % 1000003L) % 1000003L
      }
      val (prev, seq) = if (totals.exists()) totals.get() else (0L, 0L)
      val now = (prev + n, seq + 1L)
      totals.update(now)
      Iterator(TwsRunning(key, now._2, n, now._1, idSum))
    }
  }

  private val twsRuns = new java.util.concurrent.atomic.AtomicLong()

  /** q215 (round 16): the THIRD stateful-operator class under the
    * oracle — `transformWithState`, Spark 4's arbitrary-state API
    * (user-defined ValueState on the RocksDB state store provider,
    * which the API requires), exercised as a standing per-event-type
    * RUNNING TOTAL. Three files stage hours [0,2), [2,4), [4,6) under
    * the controlled one-file-per-micro-batch arrival; the processor
    * emits one row per (key, batch the key appears in) carrying the
    * batch's count + id checksum and the post-batch running total —
    * cross-batch ValueState evolution made visible row by row. The
    * DuckDB oracle replays batch assignment, per-batch sums and the
    * cumulative totals with a window over the appearance sequence. */
  def transformWithStateOnce(spark: SparkSession, dir: String)
      : DataFrame = {
    val ingestDir = stagedDir(spark, s"$dir|tws") { ingest =>
      val ev = graft.sources.Tables.events(spark, dir)
        .withColumn("rh",
          expr(s"(unix_micros(ts) - $WatermarkAnchorUs) div 3600000000"))
      stageBatches(ingest, Seq(
        ev.where(col("rh") >= 0L && col("rh") < 2L),
        ev.where(col("rh") >= 2L && col("rh") < 4L),
        ev.where(col("rh") >= 4L && col("rh") < 6L))
        .map(_.select(col("ts"), col("event_type"), col("event_id"))))
    }
    val schema = spark.read.parquet(ingestDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ingestDir)
    import spark.implicits._
    val name = s"graft_stream_tws_${twsRuns.incrementAndGet()}"
    val q = withRocksDb(spark)(src
      .select(col("event_type"), col("event_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", freshCheckpoint())
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name).orderBy("event_type", "seq")
  }

  /** Streaming exact dedup: drop repeated documents as they arrive, with
    * bounded state — `dropDuplicatesWithinWatermark` keeps a key's state
    * only until the watermark passes it, so the dedup works on an unbounded
    * stream (the training-ingest shape: a firehose of documents where
    * near-in-time republication is the dominant duplicate class). Keyed on
    * the text digest, never the full text — and on the BINARY digest
    * (`unhex(md5)`), not md5's 32-char hex string, so the state store
    * really holds 16 bytes per live document. */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_md5", unhex(md5(col("text"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_md5")

  /** Streaming LM scoring — the stream-static join shape every model-
    * scoring deployment needs: arriving documents are exploded to bigrams
    * and joined against the STATIC session-cached LM count table the
    * batch path trained (q93's model), then folded back to a per-document
    * surprisal score (same integer bits as q93). The model is a batch
    * relation Spark replans (and at this size broadcasts) into each
    * micro-batch — model refresh is a cache swap, no stream restart
    * semantics; the only streaming state is the windowed per-doc
    * aggregate, watermark-bounded.
    *
    * Out-of-vocabulary bigrams (the stream WILL see text the model never
    * trained on) are kept via a LEFT join and charged the ceiling
    * surprisal `nBits` (probability 1/N — strictly more surprising than
    * any seen bigram), so a fully-OOV document still surfaces with a
    * maximal score instead of silently vanishing from the output. */
  def lmScoredDocs(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val counts = graft.ops.TextStats.lmCounts(spark, dir)
    // model-load-time scalar (one driver action on the static side)
    val nTotal = counts.agg(sum("c")).collect()(0).getLong(0)
    val nBits = 64L - java.lang.Long.numberOfLeadingZeros(nTotal)
    docs
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ts"),
        explode(expr(graft.ops.TextStats.BigramTransformSql)).as("g"))
      .select(col("doc_id"), col("ts"), xxhash64(col("g")).as("gh"))
      .join(counts, Seq("gh"), "left")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("c").isNull, lit(nBits))
          .otherwise(lit(nBits) - length(bin(col("c"))).cast("long")))
          .as("sum_bits"))
      .select(col("doc_id"), col("nb"), col("sum_bits"),
        floor(col("sum_bits") * 1000 / col("nb")).as("doc_x1000"))
  }

  /** Streaming distinct-token tracking — the KMV sketch as STREAMING
    * state: the same O(k)-longs-per-group monoid the batch q133 uses
    * becomes the state-store payload of a complete-mode aggregate, so an
    * unbounded document stream's per-language distinct estimate runs with
    * k·8 bytes of state per language FOREVER — the degenerate case the
    * sketch exists for, since an exact streaming `count(distinct)` would
    * grow state with the value universe (and Spark rejects it in
    * streaming aggregations outright). Same hashes, same estimator ⇒
    * the stream's answer equals the batch sketch's bit-for-bit
    * (spec-asserted). */
  def kmvDistinctTokens(docs: DataFrame, k: Int = 64): DataFrame = {
    val kmv = org.apache.spark.sql.functions.udaf(
      new graft.agg.KmvSketch.Agg(k),
      org.apache.spark.sql.Encoders.product[graft.agg.KmvSketch.In])
    docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .select(col("lang"),
        graft.functions.PortableHash.h60Builtin(col("token")).as("h"))
      .groupBy("lang")
      .agg(kmv(col("h")).as("sk"))
      .select(col("lang"), col("sk.ndv_est").as("ndv_est"),
        col("sk.kth_hash").as("kth_hash"),
        col("sk.sketch_n").as("sketch_n"))
  }

  /** Streaming IVF-PQ ingest — INCREMENTAL vector indexing, the shape a
    * production vector store runs: newly arriving embeddings are coarse-
    * assigned and residual-PQ-encoded under the codebooks the batch path
    * trained, then appended to the bucket-partitioned code index. The
    * codebooks are STATIC plan literals, so the whole encode is a
    * stateless narrow map — no join, no aggregation, no watermark, no
    * streaming state at all (spec-asserted via the progress's state
    * operators) — and the stream's codes are bit-identical to the batch
    * encoder's for the same vectors. Model refresh = restart the sink
    * with new literals; in-flight micro-batches are unaffected. */
  def pqEncodedVectors(spark: SparkSession, dir: String,
      emb: DataFrame): DataFrame =
    graft.ops.Similarity.ivfPqEncodeQuantized(spark, dir,
      graft.ops.Similarity.quantize(emb)
        .select(col("vec_id"), col("qv"), col("norm2")))

  /** Streaming HNSW ingest — the GRAPH family's incremental indexing
    * (the persisted-index counterpart of [[pqEncodedVectors]]'s code
    * appends): each micro-batch of arriving embeddings is quantized and
    * inserted into the persisted shard graphs via
    * [[graft.ops.Hnsw.hnswIndexInsert]] — HNSW insertion is the SAME
    * operation a fresh build runs, so for append-only (id-monotone)
    * arrival the evolving index stays bit-identical to a from-scratch
    * batch build over everything seen so far, and any search over it
    * equals the batch q139 search (spec-proven after multiple
    * micro-batches). All per-batch work is the distributed cogroup
    * insert; the only driver state is the current index path (parquet
    * being immutable, each commit is a new directory — the store's
    * version pointer). Returns the configured foreachBatch writer plus a
    * supplier of the CURRENT index path to search. */
  def hnswIngest(spark: SparkSession, initialIndexPath: String,
      emb: DataFrame, shards: Int = 4, m: Int = 8, efC: Int = 64)
      : (org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row], () => String) = {
    val current = new java.util.concurrent.atomic.AtomicReference(
      initialIndexPath)
    val writer = emb.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val arrivals = graft.ops.Similarity.quantize(batch)
          .select(col("vec_id"), col("qv"), col("norm2"))
        current.set(graft.ops.Hnsw.hnswIndexInsert(batch.sparkSession,
          current.get, arrivals, shards, m, efC))
    }
    (writer, () => current.get)
  }

  /** Run hourlyCounts over `dir`/events.parquet to a memory sink until all
    * available data is processed (test/demo harness): stages the file into
    * a temp ingest directory, the shape a streaming deployment reads. */
  def runOnce(spark: SparkSession, dir: String, name: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val ingest = Files.createTempDirectory("graft-stream-")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      ingest.resolve("events.parquet"))
    // Complete mode: a single AvailableNow batch never advances the
    // watermark past its own data, so Append would emit nothing here.
    val q = withRocksDb(spark)(fromEventsDir(spark, ingest.toString)
      .writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Complete())
      .option("checkpointLocation", freshCheckpoint())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(name)
  }
}
