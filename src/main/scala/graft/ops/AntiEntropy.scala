package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** ANTI-ENTROPY digests (round 13) — the comparison primitive behind
  * Cassandra repair (`nodetool repair` builds Merkle trees per token
  * range and streams the ranges whose hashes differ): bucket every
  * scan-visible event into a key-range LEAF, fold each leaf to a
  * commutative content digest, and DIFF two sstable sets leaf by leaf.
  *
  * The digest is deliberately LAYOUT-INDEPENDENT: it hashes the event's
  * logical fields (key, clustering, column, kind, timestamps, sizes) and
  * never the sstable id or file offsets, and it folds with `sum` (
  * commutative/associative), so two sets holding the same logical data
  * in completely different files hash leaf-identical. q173 proves both
  * directions on real files:
  *
  *  - base set vs the size-tiered re-binning of the SAME corpus
  *    ([[CassandraDataFixture.ensureTieredFiles]]): every leaf matches —
  *    6 differently-cut sstable layouts, identical digests;
  *  - base set vs the EXECUTED major compaction's output
  *    ([[Compaction.ensureCompacted]]): leaves differ exactly where the
  *    LWW merge collapsed duplicates or purged droppable tombstones —
  *    the oracle recomputes which leaves those are from parquet.
  *
  * Scale shape: one narrow aggregate per set (map-side combine into
  * [[Leaves]] rows), a 3-way join on the tiny leaf key. Real repair
  * hashes token ranges so differing leaves can be STREAMED as ranges;
  * the fixed `key % Leaves` binning here keeps the leaf function
  * replayable in SQL — swapping in a token-range binner changes one
  * expression. */
object AntiEntropy {

  val Leaves = 64L

  private val M = 1000003L

  /** Per-leaf commutative content digest of a scan relation. */
  def leafDigest(ev: DataFrame): DataFrame =
    ev.groupBy(pmod(col("key"), lit(Leaves)).as("leaf"))
      .agg(count(lit(1)).as("events"),
        sum(graft.functions.PortableHash.h60(concat_ws(":",
          col("key"), col("clustering"), col("column_name"), col("kind"),
          col("timestamp_us"), col("ttl_s"),
          col("local_deletion_time_s"), col("size_bytes"))) % M)
          .as("digest"))

  /** q173: the three-way leaf comparison described above. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    def scanOf(p: String): DataFrame =
      DataDb.cells(spark, p, format = DataDbScan.FormatCassandra)
    val base = leafDigest(scanOf(
      CassandraDataFixture.ensureFiles(spark, dir, compressed = true)))
    val tiered = leafDigest(scanOf(
      CassandraDataFixture.ensureTieredFiles(spark, dir)))
    val compacted = leafDigest(scanOf(
      Compaction.ensureCompacted(spark, dir)))
    def named(df: DataFrame, tag: String): DataFrame =
      df.select(col("leaf"), col("events").as(s"${tag}_events"),
        col("digest").as(s"${tag}_digest"))
    named(base, "base")
      .join(named(tiered, "tiered"), Seq("leaf"), "full_outer")
      .join(named(compacted, "compacted"), Seq("leaf"), "full_outer")
      .select(col("leaf"),
        col("base_events"), col("base_digest"),
        col("tiered_events"), col("compacted_events"),
        (coalesce(col("tiered_digest"), lit(-1L)) ===
          coalesce(col("base_digest"), lit(-2L))).as("tiered_matches"),
        (coalesce(col("compacted_digest"), lit(-1L)) ===
          coalesce(col("base_digest"), lit(-2L))).as("compacted_matches"))
      .orderBy("leaf")
  }
}
