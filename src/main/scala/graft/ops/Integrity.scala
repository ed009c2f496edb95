package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.CassandraDataFixture
import graft.sources.filterdb.FilterDbFormat

/** SSTable integrity components over the REAL per-sstable file set:
  * Filter.db bloom membership and Digest.crc32 verification — the two
  * sidecars a Cassandra operator checks when validating files off a node.
  *
  * Scale shapes, stated per op:
  *  - Bloom probes: filters are per-sstable and SMALL relative to data
  *    (~10 bits/key); here the 6 fixture filters broadcast and the probe
  *    relation stays distributed. At 100 TB the same plan holds per
  *    table-shard (broadcast joins keyed by sstable); probing the union
  *    of ALL filters of a 100k-sstable cluster would instead co-partition
  *    keys by sstable and load each filter once per task.
  *  - Digest: Spark's codegen'd `crc32` over `binaryFile` content — one
  *    task per sstable, no shuffle until the 6-row count. (binaryFile
  *    materializes a whole file per row; at multi-GB sstable sizes the
  *    streaming-CRC variant over split files with crc-combine replaces it.)
  */
object Integrity {

  /** q69: every present partition key probed against its sstable's REAL
    * Filter.db — `found` MUST equal `partitions` (bloom filters have no
    * false negatives; a hash/bit-layout bug here fails the oracle).
    * False-positive behavior on absent keys is pinned by the spec (rate,
    * not membership, is the only guarantee — not oracle material). */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = false)
    val filters: Map[String, FilterDbFormat.Filter] = {
      val d = new java.io.File(path)
      d.listFiles().filter(_.getName.endsWith(FilterDbFormat.Suffix)).map { f =>
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(f)))
        try f.getName.stripSuffix(FilterDbFormat.Suffix) ->
          FilterDbFormat.parse(in)
        finally in.close()
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(filters)
    val probe = udf { (gen: Long, key: Long) =>
      bc.value(s"nb-$gen-big").mightContain(
        java.nio.ByteBuffer.allocate(8).putLong(key).array())
    }
    // fixture sstable ids map sst-<g-1> ↔ nb-<g>-big
    val keys = graft.sources.Fixtures.cells(spark, dir)
      .select(col("sstable_id"), col("key")).distinct()
      .withColumn("gen",
        regexp_extract(col("sstable_id"), "sst-(\\d+)", 1).cast("long") + 1L)
    keys
      .withColumn("present", probe(col("gen"), col("key")))
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("partitions"),
        sum(when(col("present"), 1L).otherwise(0L)).as("found"))
      .orderBy("sstable_id")
  }

  /** q70: recompute each Data.db file's CRC32 (as stored — compressed
    * bytes for the compressed variant) and compare with the Digest.crc32
    * sidecar, across BOTH fixture variants: 12 files, 12 matches. */
  def digestVerify(spark: SparkSession, dir: String): DataFrame = {
    val paths = Seq(
      CassandraDataFixture.ensureFiles(spark, dir, compressed = false),
      CassandraDataFixture.ensureFiles(spark, dir, compressed = true))
    val frames = paths.map { p =>
      val data = spark.read.format("binaryFile").load(s"$p/*-Data.db")
        .select(
          regexp_extract(col("path"), "(nb-\\d+-big)-Data\\.db", 1).as("sst"),
          crc32(col("content")).as("computed"))
      val digest = spark.read.format("binaryFile").load(s"$p/*-Digest.crc32")
        .select(
          regexp_extract(col("path"), "(nb-\\d+-big)-Digest\\.crc32", 1).as("sst"),
          decode(col("content"), "UTF-8").cast("long").as("stored"))
      data.join(digest, "sst")
    }
    frames.reduce(_ unionByName _)
      .agg(count(lit(1)).as("sstables"),
        sum(when(col("computed") === col("stored"), 1L).otherwise(0L))
          .as("matches"))
  }
}
