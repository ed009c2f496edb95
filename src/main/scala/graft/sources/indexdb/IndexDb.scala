package graft.sources.indexdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational layer over the raw Index.db source. */
object IndexDb {

  /** Read a directory (or single file) of `*-Index.db` files. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("sstable-index").load(path)

  /** Read `*-Partitions.db` tries (Cassandra 5's bti format family) into
    * the SAME relation via the full-scan trie walk — a bti sstable set
    * becomes pstats-queryable with no other pipeline change. */
  def readBti(spark: SparkSession, path: String): DataFrame =
    spark.read.format("sstable-index").option("format", "bti").load(path)

  /** Re-derive partition sizes from consecutive Data.db offsets — the
    * reference's IndexReader.java:87-98 size calculation as a `lead()`
    * window (SURVEY §2.5). The final entry of each sstable extends to the
    * sstable's Data.db length, supplied as `(sstable_id, data_length)`
    * (the reference takes it from Statistics.db metadata; it is external to
    * the index file either way). */
  def withSizes(idx: DataFrame, dataLengths: DataFrame): DataFrame = {
    val w = Window.partitionBy("sstable_id").orderBy("position")
    idx
      .join(broadcast(dataLengths), "sstable_id")
      .withColumn("size",
        coalesce(lead("position", 1).over(w), col("data_length")) -
          col("position"))
      .drop("data_length")
  }

  /** pstats-shaped per-sstable rollup straight off the raw files:
    * partition count, max/avg partition size (IndexReader.java:99-100,
    * PartitionSizeStatisticsCollector.java:174-186). */
  def sstableSection(idx: DataFrame, dataLengths: DataFrame): DataFrame =
    withSizes(idx, dataLengths)
      .groupBy("sstable_id")
      .agg(
        count(lit(1)).as("partition_count"),
        max("size").as("max_partition_size"),
        sum("size").as("uncompressed_length"))
      .withColumn("avg_partition_size",
        floor(col("uncompressed_length") / col("partition_count")))
      .orderBy("sstable_id")
}
