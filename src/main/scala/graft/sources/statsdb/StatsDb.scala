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
