package graft

import java.io.{ByteArrayOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

import graft.sources.statsdb.{StatsDb, StatsDbFixture, StatsDbFormat, StatsDbScan, StatsDbScanBuilder}

/** The raw Statistics.db DataSource V2: TOC-addressed binary codec, reading
  * via the registered short name, file-batched partition planning, file
  * pruning from sstable_id predicates, corruption detection, and equality
  * with the sstable_meta fixture view it serializes. */
class StatsDbSourceSpec extends SparkSpec {

  private def sample(tbl: String, repaired: Boolean) = StatsDbFormat.Stats(
    keyspace = "ks1", tbl = tbl, partitionCount = 42L,
    uncompressedLength = 123456L, diskLength = 74073L,
    maxPartitionSize = 9000L, avgPartitionSize = 2939L, cellCount = 777L,
    minTimestampUs = 5L, maxTimestampUs = (1L << 41) + 9L, level = 3,
    isRepaired = repaired,
    repairedAtMs = if (repaired) Some((1L << 35) + 1L) else None,
    compactionStrategy = "TWCS",
    fileTimestampMs = (1L << 38) + 7L,
    minLocalDeletionTimeS = 123L, maxLocalDeletionTimeS = 2147483647L,
    estimatedKeys = 42L, avgColumnCount = 18L, maxColumnCount = 99L,
    droppableTombstoneCount = 13L, droppableRatioX1000 = 16L)

  test("binary codec round-trips every field, with and without repairedAt") {
    Seq(sample("lineitem", repaired = true),
        sample("orders", repaired = false)).foreach { s =>
      val bos = new ByteArrayOutputStream()
      StatsDbFormat.write(new DataOutputStream(bos), s)
      assert(StatsDbFormat.parse(bos.toByteArray) === s)
    }
  }

  test("parse rejects bad magic and unknown version") {
    val bos = new ByteArrayOutputStream()
    StatsDbFormat.write(new DataOutputStream(bos), sample("t", repaired = true))
    val bytes = bos.toByteArray
    val badMagic = bytes.clone(); badMagic(0) = 0x00
    intercept[java.io.IOException](StatsDbFormat.parse(badMagic))
    val badVersion = bytes.clone(); badVersion(4) = 9 // version vint = 9
    intercept[java.io.IOException](StatsDbFormat.parse(badVersion))
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-statsdb").toFile
    d.deleteOnExit()
    Seq("aa-1-big" -> sample("lineitem", repaired = true),
        "bb-2-big" -> sample("orders", repaired = false)).foreach {
      case (id, s) =>
        val out = new DataOutputStream(
          new FileOutputStream(new java.io.File(d, id + StatsDbFormat.Suffix)))
        StatsDbFormat.write(out, s)
        out.close()
    }
    // a non-stats file the directory listing must ignore
    Files.write(new java.io.File(d, "aa-1-big-Data.db").toPath,
      Array[Byte](1, 2, 3))
    d.getAbsolutePath
  }

  test("reads one row per file via the registered short name") {
    val rows = StatsDb.read(spark, dir)
      .select("sstable_id", "tbl", "uncompressed_length", "is_repaired",
        "repaired_at_ms", "level", "compaction_strategy")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getInt(5), r.getString(6)))
      .toSet
    assert(rows === Set(
      ("aa-1-big", "lineitem", 123456L, true, (1L << 35) + 1L, 3, "TWCS"),
      ("bb-2-big", "orders", 123456L, false, -1L, 3, "TWCS")))
  }

  test("sstable_id filters prune whole files; small files batch into one task") {
    val builder = new StatsDbScanBuilder(Map("path" -> dir))
    builder.pushFilters(Array(EqualTo("sstable_id", "bb-2-big")))
    val pruned = builder.build().asInstanceOf[StatsDbScan]
    assert(pruned.planInputPartitions().length === 1)
    assert(pruned.planInputPartitions().head
      .asInstanceOf[graft.sources.statsdb.StatsDbInputPartition]
      .files.map(_._2).toSeq === Seq("bb-2-big"))
    // both surviving files land in ONE input partition (batched planning)
    val unfiltered = new StatsDbScanBuilder(Map("path" -> dir))
      .build().asInstanceOf[StatsDbScan]
    val parts = unfiltered.planInputPartitions()
    assert(parts.length === 1)
    assert(parts.head.asInstanceOf[graft.sources.statsdb.StatsDbInputPartition]
      .files.length === 2)
    // filesPerPartition=1 → one task per file (direct construction gets the
    // lower-cased key, exactly what CaseInsensitiveStringMap delivers)
    val split = new StatsDbScanBuilder(
      Map("path" -> dir, "filesperpartition" -> "1"))
      .build().asInstanceOf[StatsDbScan]
    assert(split.planInputPartitions().length === 2)
  }

  test("filesPerPartition reaches the scan through the public read path") {
    // spark.read lower-cases option keys (CaseInsensitiveStringMap) — this
    // exercises the mixed-case spelling a user would actually write
    val split = spark.read.format("sstable-stats")
      .option("filesPerPartition", "1").load(dir)
    assert(split.rdd.getNumPartitions === 2)
    val batched = spark.read.format("sstable-stats").load(dir)
    assert(batched.rdd.getNumPartitions === 1)
  }

  test("fixture roundtrip equals the sstable_meta view, field for field") {
    val cols = Seq("sstable_id", "keyspace", "tbl", "partition_count",
      "uncompressed_length", "disk_length", "max_partition_size",
      "avg_partition_size", "cell_count", "min_timestamp_us",
      "max_timestamp_us", "level", "is_repaired", "repaired_at_ms",
      "compaction_strategy", "file_timestamp_ms",
      "min_local_deletion_time_s", "max_local_deletion_time_s",
      "estimated_keys", "avg_column_count", "max_column_count",
      "droppable_tombstone_count", "droppable_ratio_x1000")
    val raw = StatsDb.read(spark, StatsDbFixture.ensureFiles(spark, Sf0001))
      .select(cols.map(col): _*).orderBy("sstable_id").collect().toSeq
    val view = graft.sources.Fixtures.sstableMeta(
        graft.sources.Fixtures.allPscan(spark, Sf0001))
      .select(cols.map(col): _*).orderBy("sstable_id").collect().toSeq
    assert(raw === view)
    assert(raw.size === 10) // 6 lineitem + 4 orders sstables
  }

  test("summaryRollup off raw files equals Summary.rollup off the fixture") {
    val raw = StatsDb.summaryRollup(
      spark, StatsDbFixture.ensureFiles(spark, Sf0001)).collect().toSeq
    val view = graft.ops.Summary.rollup(spark, Sf0001).collect().toSeq
    assert(raw === view)
  }
}
