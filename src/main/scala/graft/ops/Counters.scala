package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** Distributed counters, executed end to end (round 16) — the
  * shard-merge model Cassandra 2.1+ uses so increments survive
  * compaction and replication without double counting:
  *
  *  - every increment lands at a WRITING NODE; the node
  *    read-before-writes its own shard, so the shard a given sstable
  *    carries for (cell, node) is `(clock = the node's latest
  *    increment timestamp in that sstable, count = the node's
  *    CUMULATIVE total as of that clock)` — cumulative, not a delta
  *    (the pre-2.1 delta design lost increments on replay and was
  *    abandoned);
  *  - the MERGE rule across sstables/replicas: per (cell, node) the
  *    highest-clock shard wins outright (it already contains
  *    everything older); the cell's value is the sum of winning
  *    shards over nodes.
  *
  * The correctness trap this models is exact: SUMMING shards across
  * sstables double-counts (each shard repeats the older history),
  * while taking max-clock per node loses nothing — so the oracle can
  * pin both sides: `merged_total` must equal the plain sum of all
  * deltas (no loss, no double count) even though the shard table
  * holds strictly more shards than (cell, node) pairs.
  *
  * Runs on the fixture relation: the real cell format models
  * counter-ness as a column TYPE the fixture deliberately drops
  * (CassandraDataFixture's representation note), so the shard algebra
  * — the actual distributed-systems content — is what executes here.
  *
  * Scale shape: the running sum is a bounded-partition window (one
  * (cell, node)'s increments — a handful of rows); shard extraction
  * and the merge are ordinary combine-enabled aggregates; no global
  * window, no driver state. */
object Counters {

  /** Writing node of an increment. */
  val Nodes = 4L

  /** Rollup buckets (key % Buckets). */
  val Buckets = 16L

  private val M = 1000003L

  /** q234: per-bucket counter accounting — cells, shard rows (more
    * than (cell, node) pairs: the double-count trap exists), the
    * merged totals under the max-clock rule, the plain delta sum they
    * must equal, and clock/count digests over the winning shards. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val inc = Fixtures.cells(spark, dir)
      .where(col("kind") === "CELL" && !col("is_tombstone"))
      .select(col("key"), col("clustering"), col("column_name"),
        col("sstable_id"), col("timestamp_us"),
        pmod(col("key") + col("clustering"), lit(Nodes)).as("node"),
        col("size_bytes").as("delta"))
    // read-before-write: the node's cumulative total at each of its
    // own increments (bounded partition: one cell's one node)
    val w = Window
      .partitionBy("key", "clustering", "column_name", "node")
      .orderBy("timestamp_us", "delta", "sstable_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = inc.withColumn("run", sum("delta").over(w))
    // the shard a given sstable carries: latest clock + the cumulative
    // count as of it
    val shards = withRun
      .groupBy("key", "clustering", "column_name", "node", "sstable_id")
      .agg(max(struct(col("timestamp_us").as("clock"),
        col("run").as("count"), col("sstable_id").as("sid"))).as("sh"))
      .select(col("key"), col("clustering"), col("column_name"),
        col("node"), col("sh.clock").as("clock"),
        col("sh.count").as("count"))
    // merge: max-clock shard per (cell, node) wins outright. The shard
    // row count rides the SAME aggregate (round 19, guide §1.2): the
    // former separate shardCounts branch re-ran the window + shard
    // extraction subtree a second time — count and max distribute over
    // the (cell, node) grouping, so one pass carries both.
    val winners = shards
      .groupBy("key", "clustering", "column_name", "node")
      .agg(max(struct(col("clock"), col("count"))).as("w"),
        count(lit(1)).as("shard_rows_n"))
      .select(col("key"), col("clustering"), col("column_name"),
        col("node"), col("w.clock").as("clock"),
        col("w.count").as("count"), col("shard_rows_n"))
    val perCell = winners
      .groupBy("key", "clustering", "column_name")
      .agg(sum("count").as("merged"),
        sum(col("clock") % M).as("clock_digest"),
        count(lit(1)).as("nodes"),
        sum("shard_rows_n").as("shard_rows"))
    val deltas = inc.groupBy("key", "clustering", "column_name")
      .agg(sum("delta").as("delta_total"))
    perCell
      .join(deltas, Seq("key", "clustering", "column_name"))
      .groupBy(pmod(col("key"), lit(Buckets)).as("bucket"))
      .agg(
        count(lit(1)).as("cells"),
        sum("shard_rows").as("shard_rows"),
        sum("nodes").as("node_shards"),
        sum("merged").as("merged_total"),
        sum("delta_total").as("delta_total"),
        sum(col("clock_digest")).as("clock_digest"),
        (sum("merged") === sum("delta_total")).as("exact"))
      .orderBy("bucket")
  }
}
