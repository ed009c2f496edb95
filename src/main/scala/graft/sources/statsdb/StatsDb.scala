package graft.sources.statsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing entry points for the raw Statistics.db source. */
object StatsDb {

  /** Read a directory (or single file) of `*-Statistics.db` files: one row
    * per sstable, zero data-file reads — the reference's `summary`/`sstables`
    * access path (CassandraBackend.java:89-123). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("sstable-stats").load(path)

  /** Read REAL-format (Cassandra "nb") Statistics.db files
    * ([[CassandraStatsFormat]]): one row per file, the full StatsMetadata
    * field set, droppable-tombstone estimate evaluated at `gcBeforeS` —
    * `table.getDroppableTombstonesBefore(NOW_SECONDS - gcGraceSeconds)`
    * (CassandraBackend.java:116). */
  def readCassandra(spark: SparkSession, path: String,
      gcBeforeS: Long): DataFrame =
    spark.read.format("sstable-stats")
      .option("format", "cassandra")
      .option("gcbefore", gcBeforeS.toString)
      .load(path)

  /** q77: big-format version "oa" Statistics.db files — the base "nb"
    * StatsMetadata plus the version-gated tail appended after
    * `isTransient` ([[CassandraStatsFormat.VersionedTail]]:
    * originatingHostId, partition-level-deletions marker, first/last key
    * range, token-space coverage). Two base fields ride along to prove the
    * pre-tail section still parses at the shifted layout. One task per
    * file via binaryFile — metadata files are KBs regardless of data
    * volume, the reference's own metadata-only access-path grain. */
  def readOaTail(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$path/oa-*-big${CassandraStatsFormat.Suffix}")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val gen = "oa-(\\d+)-big".r.findFirstMatchIn(p).get.group(1).toLong
        val f = CassandraStatsFormat.parse(bytes, version = "oa")
        val t = f.stats.tail.getOrElse(throw new java.io.IOException(
          s"oa file without versioned tail: $p"))
        def keyLong(b: Array[Byte]): Long =
          java.nio.ByteBuffer.wrap(b).getLong
        (gen,
          t.originatingHostId.map(_._1).getOrElse(0L),
          t.originatingHostId.map(_._2).getOrElse(0L),
          t.hasPartitionLevelDeletions,
          keyLong(t.firstKey), keyLong(t.lastKey),
          math.floor(t.tokenSpaceCoverage * 1e6).toLong,
          f.stats.totalRows, f.stats.minTimestampUs)
      }
      .toDF("generation", "host_id_msb", "host_id_lsb",
        "has_partition_deletions", "first_key", "last_key",
        "token_coverage_x1e6", "total_rows", "min_timestamp_us")
      .orderBy("generation")
  }

  /** q100: the 5.0 "oa" covered-clustering slice (CASSANDRA-14261's
    * improved min/max, which "oa" writes IN PLACE of the legacy
    * min/maxClustering blob lists): per file the start/end bound kind
    * ordinals, total component counts, the NULL / EMPTY component counts
    * the per-block flag header encodes, and the byte sums of the real
    * values — every column a pure function of the generation, so the
    * oracle recomputes the whole slice without touching the binary.
    * Parsing these files with the pre-slice layout would misread
    * everything after `repairedAt`, so green here proves the version gate
    * switches the field order correctly. */
  def readOaSlice(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(s"$path/oa-*-big${CassandraStatsFormat.Suffix}")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val gen = "oa-(\\d+)-big".r.findFirstMatchIn(p).get.group(1).toLong
        val f = CassandraStatsFormat.parse(bytes, version = "oa")
        val s = f.stats.coveredClustering.getOrElse(
          throw new java.io.IOException(s"oa file without slice: $p"))
        def byteSum(b: CassandraStatsFormat.ClusteringBound): Long =
          b.values.flatten.map(_.map(_ & 0xff).sum.toLong).sum
        (gen,
          b2l(s.start.kind), b2l(s.end.kind),
          s.start.values.length.toLong, s.end.values.length.toLong,
          s.start.values.count(_.isEmpty).toLong,
          s.start.values.count(v => v.exists(_.isEmpty)).toLong,
          byteSum(s.start), byteSum(s.end),
          f.stats.totalRows)
      }
      .toDF("generation", "start_kind", "end_kind",
        "start_components", "end_components",
        "start_null_count", "start_empty_count",
        "start_bytes_sum", "end_bytes_sum", "total_rows")
      .orderBy("generation")
  }

  private def b2l(i: Int): Long = i.toLong

  /** A11 rollup (SummaryCollector.java:41-68) off raw metadata files: the
    * same aggregation `Summary.rollup` runs on the fixture view. */
  def summaryRollup(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
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
}
