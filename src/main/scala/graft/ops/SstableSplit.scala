package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** `sstablesplit` (round 14) — Cassandra's oversized-sstable splitter:
  * take ONE sstable (the one a major compaction or a bulk load left too
  * big) and rewrite it as N size-targeted sstables WITHOUT merging or
  * purging anything, keeping every partition intact in exactly one
  * output (the tool never splits a partition across files).
  *
  * Selection and assignment are relational and oracle-replayable:
  *
  *  - **victim** = the sstable with the largest modeled volume (the
  *    q162 model, 32 B envelope + value length), sstable_id tiebreak;
  *  - **shards**: partitions in key order, each output taking
  *    consecutive partitions until ~¼ of the victim's volume — shard =
  *    least((bytes_before · 4) div total, 3), a running-sum window over
  *    the victim's per-partition sizes. Quarters rather than a fixed
  *    byte target keep the fixture scale-free; a real deployment passes
  *    the tool's size target into the same formula.
  *
  * The outputs are REAL sstables through the DSv2 sink, re-read through
  * the production scan for the q179 relation. Scale shape: the window
  * runs over ONE file's partition list (the victim — exactly the state
  * the real tool holds), everything else is the sink's clustered
  * exchange; untouched sstables never enter the plan. */
object SstableSplit {

  /** Output shard count (quarters). */
  val Shards = 4L

  /** Output generations: shard i writes sst-(OutGenBase + i). */
  val OutGenBase = 930L

  private val ChkMod = 1000003L

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[(String, String)])]()

  private def sweep(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
  }

  private def inputEvents(spark: SparkSession, inPath: String): DataFrame =
    DataDb.cells(spark, inPath, format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))

  /** The victim: largest modeled volume, id tiebreak — one pruned
    * aggregate, O(#sstables) driver rows. */
  def victim(spark: SparkSession, dir: String): (String, Long) = {
    val inPath = CassandraDataFixture.ensureFiles(spark, dir,
      compressed = false)
    inputEvents(spark, inPath)
      .groupBy("sstable_id")
      .agg(sum(lit(Compaction.EventOverheadBytes) + col("size_bytes"))
        .as("bytes"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .maxBy { case (id, b) => (b, id) }
  }

  /** Split the victim into [[Shards]] real sstables; returns
    * (outputDir, victimId), session-memoized. */
  def ensureSplit(spark: SparkSession, dir: String): (String, String) = {
    val key = s"${graft.sources.PlanCache.sessionKey(spark)}|$dir|split"
    val slot = memo.synchronized {
      sweep()
      val hit = memo.get(key)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => build(spark, dir))
        memo.put(key, (spark, s))
        s
      }
    }
    slot.value
  }

  /** Default bucket count of the two-level running sum. */
  val PrefixBuckets = 1024

  /** Per-partition shard assignment off the (key, pb) relation — the
    * TWO-LEVEL bucketed prefix sum (round 15, replacing a
    * `pmod(key,1)` single-reducer window: a multi-GB victim with tens
    * of millions of partitions would serialize its whole partition
    * list onto one task). Same shape as TextStats.packSequences:
    * contiguous key-range buckets carry bounded in-bucket windows; the
    * per-bucket totals (O(buckets) driver rows, the same class as the
    * compaction tier tables) prefix-sum on the driver and join back
    * broadcast as each bucket's base — NO unpartitioned window
    * anywhere in the plan. bytes_before = bucket_base + in-bucket
    * offset is exactly the plain window's `cum - pb`, so the shard
    * relation (and the q179 oracle hash) is unchanged. */
  private[graft] def shardAssignment(perPart: DataFrame, total: Long,
      shards: Long = Shards, buckets: Int = PrefixBuckets): DataFrame = {
    val spark = perPart.sparkSession
    // persist covers the three materializations (bounds, bucket totals,
    // the assignment itself) and is RELEASED before returning — the
    // assignment is collected eagerly, which is the same driver-scale
    // class as the broadcast() every caller immediately applies to it
    // (ADVICE r15: the old lazy return left the cache pinned for the
    // session lifetime).
    val cached = perPart.persist()
    try {
      val plan = shardAssignmentPlan(cached, total, shards, buckets)
      val rows = plan.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), plan.schema)
    } finally {
      cached.unpersist()
      ()
    }
  }

  /** The lazy two-level plan behind [[shardAssignment]] — separated so
    * the plan-shape specs can assert NO unpartitioned window on the
    * actual assignment plan (the eager wrapper's local relation has no
    * windows to inspect). */
  private[graft] def shardAssignmentPlan(perPart: DataFrame, total: Long,
      shards: Long = Shards, buckets: Int = PrefixBuckets): DataFrame = {
    val spark = perPart.sparkSession
    val bounds = perPart.agg(min("key"), max("key")).head
    val (minK, maxK) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (maxK - minK) / buckets + 1L)
    val t = perPart.withColumn("bucket",
      floor((col("key") - lit(minK)) / lit(width)))
    val perBucket = t.groupBy("bucket").agg(sum("pb").as("bucket_pb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val baseRows = perBucket.map { case (b, pb) =>
      val base = (b, acc); acc += pb; base
    }
    import spark.implicits._
    val bases = baseRows.toSeq.toDF("bucket", "bucket_base")
    val inBucket = Window.partitionBy("bucket").orderBy("key")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("in_off", coalesce(sum("pb").over(inBucket), lit(0L)))
      .join(broadcast(bases), "bucket")
      .withColumn("shard",
        least(expr(s"((bucket_base + in_off) * $shards) div $total"),
          lit(shards - 1L)))
      .select("key", "shard")
  }

  private def build(spark: SparkSession, dir: String): (String, String) = {
    val inPath = CassandraDataFixture.ensureFiles(spark, dir,
      compressed = false)
    val (vid, total) = victim(spark, dir)
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-sstable-split"))
      .toString
    val ev = inputEvents(spark, inPath).where(col("sstable_id") === vid)
    // per-partition modeled bytes → two-level running sum in key order →
    // quarter assignment (the window state the real tool holds is one
    // file's partition list; the two-level form keeps even that off a
    // single task)
    val perPart = ev
      .groupBy("key")
      .agg(sum(lit(Compaction.EventOverheadBytes) + col("size_bytes"))
        .as("pb"))
    val shards = shardAssignment(perPart, total)
    ev.join(broadcast(shards), "key")
      .select(
        concat(lit("sst-"), (lit(OutGenBase) + col("shard"))
          .cast("string")).as("sstable_id"),
        col("key"), col("clustering"), col("column_name"), col("kind"),
        col("timestamp_us"), col("ttl_s"), col("local_deletion_time_s"),
        col("is_tombstone"), col("is_expiring"), col("size_bytes"))
      .write.format("sstable-data")
      .option("path", out).option("compressed", "false")
      .mode("append").save()
    (out, vid)
  }

  /** q179: the split relation — each output shard read back from its
    * real file (unit `shard-<i>`), with per-shard volume and content
    * checksums; partitions stay intact and shards tile the victim's key
    * space in order (first/last keys pin it). */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val (outPath, _) = ensureSplit(spark, dir)
    DataDb.cells(spark, outPath, format = DataDbScan.FormatCassandra)
      .withColumn("shard",
        regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L - OutGenBase)
      .groupBy(concat(lit("shard-"), col("shard").cast("string"))
        .as("unit"))
      .agg(
        count(lit(1)).as("events"),
        countDistinct("key").as("partitions"),
        min("key").as("first_key"),
        max("key").as("last_key"),
        sum(lit(Compaction.EventOverheadBytes) + col("size_bytes"))
          .as("model_bytes"),
        sum(col("key") % ChkMod).as("keys_sum"),
        sum(col("clustering") % ChkMod).as("clustering_sum"),
        sum(col("timestamp_us") % ChkMod).as("ts_sum"),
        sum(col("ttl_s") % ChkMod).as("ttl_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(col("size_bytes") % ChkMod).as("value_sum"))
      .orderBy("unit")
  }
}
