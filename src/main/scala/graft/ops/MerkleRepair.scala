package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** Merkle-tree descent, executed end to end (round 16) — the LOG-COST
  * mismatch localization a real `nodetool repair` validation phase
  * runs, and the piece the anti-entropy family (q173+, flat 64-leaf
  * digests) deliberately skipped: with a binary digest tree over the
  * token ring, a LOCALIZED divergence is found by comparing O(log n)
  * nodes instead of every leaf — the coordinator opens only the
  * children of mismatched nodes and stops cold on every matching
  * subtree.
  *
  *  - **Tree.** Depth [[Depth]] over the 64 token leaves
  *    ([[AntiEntropy.TokenLeafShift]]); a node's digest is the SUM of
  *    its children's (the engine's additive commutative digest algebra
  *    standing in for real Merkle hashing — same localization
  *    structure, and SQL-replayable).
  *  - **Replicas.** A holds the corpus; B misses exactly the events
  *    of token leaf [[DivergentLeaf]] timestamped at/after
  *    [[StaleFromUs]] — a single-range divergence, the shape a brief
  *    partition leaves behind.
  *  - **Descent.** Root first; a matching node VERIFIES its whole
  *    subtree and stops; a mismatching internal node descends to both
  *    children; a mismatching leaf is the STREAM target. With one
  *    divergent leaf the visited set is exactly `2·depth + 1` nodes
  *    (13 of 127) — the contract the oracle pins row by row.
  *
  * Scale shape: per-replica leaf digests are one narrow pruned
  * aggregate each (the same exchange q181 runs standing); the tree
  * and descent are O(#leaves) COORDINATOR state (64 rows collected —
  * RepairMatrix.digestMap's precedent), which is the real tool's own
  * memory model: Merkle trees live on the repair coordinator. */
object MerkleRepair {

  /** Tree depth: 2^Depth = 64 leaves. */
  val Depth = 6

  /** The one divergent token leaf. */
  val DivergentLeaf = 42L

  /** B's gap: leaf [[DivergentLeaf]] events at/after this timestamp
    * (fixture day 2200). */
  val StaleFromUs: Long = 2200L * 86400000000L

  /** Generations: A = 2700, B = 2710. */
  val AGen = 2700L
  val BGen = 2710L

  private val M = 1000003L


  private val EventCols = Seq("key", "clustering", "column_name", "kind",
    "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
    "is_expiring", "size_bytes")

  private def leaf =
    shiftright(AntiEntropy.token(col("key")), AntiEntropy.TokenLeafShift)

  /** A (full) and B (single-leaf-gapped) under one dir
    * (session-memoized). */
  def ensureReplicas(spark: SparkSession, dir: String): String =
    OpMemo.memoized(spark, s"$dir|merkle") {
      val out = graft.sources.TempDirs.register(
        java.nio.file.Files.createTempDirectory("graft-merkle")).toString
      val inPath = CassandraDataFixture.ensureFiles(spark, dir,
        compressed = true)
      val ev = DataDb.cells(spark, inPath,
        format = DataDbScan.FormatCassandra)
      def sink(e: DataFrame, gen: Long): Unit =
        e.select((lit(s"sst-$gen").as("sstable_id") +:
            EventCols.map(col)): _*)
          .write.format("sstable-data")
          .option("path", out).option("compressed", "true")
          .mode("append").save()
      sink(ev, AGen)
      sink(ev.where(!(leaf === DivergentLeaf &&
        col("timestamp_us") >= StaleFromUs)), BGen)
      out
    }

  private def eventHash = graft.functions.PortableHash.h60(concat_ws(":",
    col("key"), col("clustering"), col("column_name"), col("kind"),
    col("timestamp_us"), col("ttl_s"), col("local_deletion_time_s"),
    col("size_bytes"))) % M

  // raw-equality filter: pushes down, pruning at planning to exactly the
  // two replica files (a regexp filter would scan everything). ONE scan
  // covers BOTH replicas (round 19, guide §1.2/§2.4): the two per-replica
  // digest jobs each read one corpus-sized file sequentially — grouping by
  // (sstable_id, leaf) in a single job reads the same total bytes with
  // twice the task parallelism and one job's scheduling overhead, and the
  // per-replica maps split out of the one collected O(2·leaves) result.
  private def leafDigests(spark: SparkSession, path: String,
      gens: Seq[Long]): Map[Long, Map[Long, (Long, Long)]] = {
    val idToGen = gens.map(g => s"nb-${g + 1}-big" -> g).toMap
    val byGen = DataDb.cells(spark, path, format = DataDbScan.FormatCassandra)
      .where(col("sstable_id").isin(idToGen.keys.toSeq: _*))
      .groupBy(col("sstable_id"), leaf.as("leaf"))
      .agg(count(lit(1)).as("events"), sum(eventHash).as("digest"))
      .collect()
      .groupBy(r => idToGen(r.getString(0)))
      .map { case (g, rows) =>
        g -> rows.map(r =>
          r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
      }
    gens.map(g => g -> byGen.getOrElse(g, Map.empty[Long, (Long, Long)]))
      .toMap
  }

  /** q229: the descent transcript — one row per VISITED node (level,
    * index, subtree width, both digests, matched, action). A matching
    * node's whole subtree is verified unvisited; the mismatch chain
    * narrows to the one divergent leaf, whose action is 'stream'.
    * Exactly 2·depth + 1 rows when one leaf diverges. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val reps = ensureReplicas(spark, dir)
    val digests = leafDigests(spark, reps, Seq(AGen, BGen))
    val a = digests(AGen)
    val b = digests(BGen)
    // node (level, idx) spans leaves [idx << (Depth-level), (idx+1) <<
    // (Depth-level)); digest = additive rollup of the replica's leaves
    def node(m: Map[Long, (Long, Long)], level: Int, idx: Long)
        : (Long, Long) = {
      val width = 1L << (Depth - level)
      val from = idx * width
      (from until from + width).foldLeft((0L, 0L)) { case ((e, d), l) =>
        val (le, ld) = m.getOrElse(l, (0L, 0L))
        (e + le, d + ld)
      }
    }
    // the descent: a work queue of nodes to compare, children enqueued
    // only under mismatch
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Boolean, String)]
    val queue = scala.collection.mutable.Queue((0, 0L))
    while (queue.nonEmpty) {
      val (level, idx) = queue.dequeue()
      val (_, ad) = node(a, level, idx)
      val (_, bd) = node(b, level, idx)
      val matched = ad == bd
      val action =
        if (matched) "verified-stop"
        else if (level < Depth) "descend"
        else "stream"
      if (!matched && level < Depth) {
        queue.enqueue((level + 1, idx * 2))
        queue.enqueue((level + 1, idx * 2 + 1))
      }
      rows += ((level.toLong, idx, 1L << (Depth - level), ad, bd,
        matched, action))
    }
    import spark.implicits._
    rows.toSeq
      .toDF("level", "node_idx", "span_leaves", "a_digest", "b_digest",
        "matched", "action")
      .orderBy("level", "node_idx")
  }
}
