package graft.sources.datadb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational layer over the raw Data.db source. */
object DataDb {

  /** Read a directory (or single file) of `*-Data.db` files: one row per
    * cell / range-tombstone-marker event. `maxSplitBytes` caps the byte
    * range one task parses — files with an Index.db sidecar split at
    * partition boundaries (default 128 MB, Spark's files.maxPartitionBytes
    * default). */
  def read(spark: SparkSession, path: String,
      maxSplitBytes: Option[Long] = None,
      format: String = DataDbScan.FormatGraft): DataFrame = {
    val r = spark.read.format("sstable-data").option("format", format)
    maxSplitBytes.foreach(b => r.option("maxSplitBytes", b.toString))
    r.load(path)
  }

  /** ONE shared Hadoop configuration for the per-partition decode path:
    * `new Configuration()` loads its XML resources through a classloader
    * scan under a GLOBAL lock — constructed per partition it serialized
    * every scrub task on the URLClassPath monitor (round 16, found via
    * thread dump: 32 workers BLOCKED in Configuration.loadResource).
    * Configuration reads are safe to share once loaded. */
  private lazy val sharedConf = new org.apache.hadoop.conf.Configuration()

  /** Decode ONE partition's events from its Index.db byte range
    * [start, end) of `file`, ISOLATED from the rest of the file — the
    * scrub tool's unit of salvage (round 16): a corrupted partition's
    * decode failure must not take down its neighbors. Returns the
    * event iterator plus the close handle; the iterator may throw
    * mid-drain on corrupt bytes (the codecs are fail-closed) — callers
    * catch per partition. */
  def partitionEvents(file: String, start: Long, end: Long,
      format: String = DataDbScan.FormatCassandra)
      : (Iterator[DataDbFormat.Event], java.io.Closeable) = {
    val es = new EventStream(file, start, end, sharedConf, format)
    (es.events, new java.io.Closeable {
      override def close(): Unit = es.close()
    })
  }

  /** Raw events in the `cells` fixture shape (keyspace/tbl constants and
    * the key decoded through the key-validator form, X4): the entire
    * cfstats/purge pipeline — `Fixtures.partitionScan`, `partitions`,
    * every report — runs unchanged off real binary files. */
  def cells(spark: SparkSession, path: String, keyspace: String = "ks1",
      tbl: String = "lineitem", maxSplitBytes: Option[Long] = None,
      format: String = DataDbScan.FormatGraft): DataFrame =
    read(spark, path, maxSplitBytes, format)
      .withColumn("key", graft.sources.BinaryKeys.beLong(col("key")))
      .withColumn("keyspace", lit(keyspace))
      .withColumn("tbl", lit(tbl))
      .withColumn("key_formatted", concat(lit("key-"), col("key")))
}
