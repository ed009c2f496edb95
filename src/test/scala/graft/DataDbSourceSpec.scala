package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}

import graft.sources.Fixtures
import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbFixture, DataDbFormat, DataDbScan, DataDbScanBuilder}

/** The raw Data.db DataSource V2: binary event codec, partition framing,
  * file reading via the registered short name, column pruning, sstable_id
  * filter → file pruning, and full-pipeline equivalence with the parquet
  * fixture path. */
class DataDbSourceSpec extends SparkSpec {

  private def evt(cl: Long, colName: String, marker: Boolean, flags: Int,
      ts: Long, ttl: Long, ldt: Long, size: Long) =
    DataDbFormat.Event(null, cl,
      colName.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      if (marker) DataDbFormat.KindCodeMarker else DataDbFormat.KindCodeCell,
      flags, ts, ttl, ldt, size)

  test("event codec round-trips partitions, flags, sentinels and vint bounds") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // partition 1: two cells incl. NO_TTL(-1) and MAX_VALUE deletion time
    DataDbFormat.writePartitionHeader(out, Array[Byte](1, 2))
    DataDbFormat.writeEvent(out, evt(0L, "c0", marker = false,
      DataDbFormat.FlagLive, 12345L, -1L, 2147483647L, 64L))
    DataDbFormat.writeEvent(out, evt(2L, "c1", marker = false,
      DataDbFormat.FlagTombstone, (1L << 49) + 7L, 86400L, 9999L, 1L))
    DataDbFormat.writePartitionEnd(out)
    // partition 2: a range-tombstone marker with a multi-flag byte, and a
    // cell with a NEGATIVE write timestamp (arbitrary signed longs in
    // Cassandra — zigzag-encoded, so the full domain round-trips)
    DataDbFormat.writePartitionHeader(out, Array[Byte](-1))
    DataDbFormat.writeEvent(out, evt(1L, "range:1", marker = true,
      DataDbFormat.FlagTombstone | DataDbFormat.FlagExpiring, 7L, 0L, 0L, 0L))
    DataDbFormat.writeEvent(out, evt(3L, "c2", marker = false,
      DataDbFormat.FlagLive, Long.MinValue + 5L, -1L, 0L, 8L))
    DataDbFormat.writePartitionEnd(out)
    val got = DataDbFormat.events(
      new ByteArrayInputStream(bos.toByteArray)).toList
    assert(got.map(_.key.toSeq) ===
      List(Seq[Byte](1, 2), Seq[Byte](1, 2), Seq[Byte](-1), Seq[Byte](-1)))
    assert(got.map(_.clustering) === List(0L, 2L, 1L, 3L))
    assert(got.map(_.columnName) === List("c0", "c1", "range:1", "c2"))
    assert(got.map(_.isMarker) === List(false, false, true, false))
    assert(got.map(_.timestampUs) ===
      List(12345L, (1L << 49) + 7L, 7L, Long.MinValue + 5L))
    assert(got.map(_.ttlS) === List(-1L, 86400L, 0L, -1L))
    assert(got.map(_.localDeletionTimeS) === List(2147483647L, 9999L, 0L, 0L))
    assert(got.map(_.sizeBytes) === List(64L, 1L, 0L, 8L))
    assert(got(0).isLive && !got(0).isTombstone)
    assert(got(1).isTombstone && !got(1).isLive)
    assert(got(2).isTombstone && got(2).isExpiring && !got(2).isCounter)
  }

  test("binary key decode is signed: top-bit-set keys survive the cells view") {
    import spark.implicits._
    val keys = Seq(Long.MinValue, -1L, -42L, 0L, 7L, Long.MaxValue)
    val df = keys.map(k => Tuple1(
        java.nio.ByteBuffer.allocate(8).putLong(k).array())).toDF("key")
    val got = df.select(graft.sources.BinaryKeys.beLong(col("key")).as("k"))
      .as[Long].collect().toSeq
    assert(got === keys)
  }

  test("truncated partition (missing end marker) fails, empty stream is empty") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    DataDbFormat.writePartitionHeader(out, Array[Byte](9))
    DataDbFormat.writeEvent(out, evt(0L, "c", marker = false, 8, 1L, -1L, 0L, 5L))
    // no writePartitionEnd
    intercept[java.io.EOFException] {
      DataDbFormat.events(new ByteArrayInputStream(bos.toByteArray)).toList
    }
    assert(DataDbFormat.events(
      new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }

  test("DSv2 parse reproduces the parquet cell fixture exactly") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val raw = DataDb.cells(spark, dir)
      .select("sstable_id", "key", "clustering", "column_name", "kind",
        "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
        "is_expiring", "is_counter", "is_live", "size_bytes")
    val fix = Fixtures.cells(spark, Sf0001)
      .select("sstable_id", "key", "clustering", "column_name", "kind",
        "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
        "is_expiring", "is_counter", "is_live", "size_bytes")
    // multiset equality via exceptAll both ways (rows can repeat)
    assert(raw.count() === fix.count())
    assert(raw.exceptAll(fix).isEmpty && fix.exceptAll(raw).isEmpty)
  }

  test("cfstats pipeline off raw binary equals the parquet-derived pipeline") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val fromRaw = Fixtures.partitions(
      Fixtures.partitionScan(DataDb.cells(spark, dir)))
    val fromParquet = Fixtures.liPartitions(spark, Sf0001)
    assert(fromRaw.exceptAll(fromParquet).isEmpty &&
      fromParquet.exceptAll(fromRaw).isEmpty)
  }

  test("sstable_id predicates prune whole files at planning time") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    def plan(filters: org.apache.spark.sql.sources.Filter*) = {
      val b = new DataDbScanBuilder(Map("path" -> dir))
      b.pushFilters(filters.toArray)
      b.build().asInstanceOf[DataDbScan].planInputPartitions()
    }
    val all = plan()
    assert(all.length === 6)
    assert(plan(EqualTo("sstable_id", "sst-3")).length === 1)
    assert(plan(In("sstable_id", Array("sst-0", "sst-5", "nope"))).length === 2)
    // and through the public read path the rows really are filtered
    val ids = DataDb.read(spark, dir)
      .where(col("sstable_id") === "sst-3")
      .select("sstable_id").distinct().collect().map(_.getString(0))
    assert(ids.toSeq === Seq("sst-3"))
  }

  test("companion Index.db sidecar splits files at partition boundaries") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val b = new DataDbScanBuilder(
      Map("path" -> dir, "maxsplitbytes" -> "2048"))
    val parts = b.build().asInstanceOf[DataDbScan].planInputPartitions()
      .map(_.asInstanceOf[graft.sources.datadb.DataDbInputPartition])
    assert(parts.length > 6, s"expected multi-split plan, got ${parts.length}")
    // ranges tile each file exactly: start 0, contiguous, end = file length
    val conf = spark.sessionState.newHadoopConf()
    parts.groupBy(_.file).foreach { case (f, ps) =>
      val sorted = ps.sortBy(_.start)
      assert(sorted.head.start === 0L)
      val hp = new org.apache.hadoop.fs.Path(f)
      assert(sorted.last.end === hp.getFileSystem(conf).getFileStatus(hp).getLen)
      sorted.sliding(2).foreach {
        case Array(a, b2) => assert(a.end === b2.start, s"gap in $f")
        case _ => ()
      }
    }
    // a split read returns exactly the rows of the whole-file read
    val split = spark.read.format("sstable-data")
      .option("maxSplitBytes", "2048").load(dir)
    val whole = DataDb.read(spark, dir)
    assert(split.rdd.getNumPartitions > whole.rdd.getNumPartitions)
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
  }

  test("adaptive split target follows Spark's maxSplitBytes formula " +
      "and an unsized scan equals an explicitly sized one") {
    // the formula: min(cap, max(openCost, totalBytes / parallelism))
    val open = 4L << 20
    val cap = DataDbScan.DefaultSplitBytes
    assert(DataDbScan.adaptiveSplitBytes(Nil, 8) === cap,
      "no files degrades to the fixed default")
    assert(DataDbScan.adaptiveSplitBytes(Seq(1L << 20, 1L << 20), 32)
      === open, "tiny corpora land on the open-cost floor")
    assert(DataDbScan.adaptiveSplitBytes(Seq(64L << 30), 32) === cap,
      "huge corpora cap at the fixed default (sequential-range band)")
    // 2 GiB (+ 2 files' open-cost padding, per SPARK-17998) over 32 cores
    val mid = Seq.fill(2)(1L << 30)
    assert(DataDbScan.adaptiveSplitBytes(mid, 32) ===
      ((2L << 30) + 2L * open) / 32,
      "mid-scale corpora split at (totalBytes + openCost/file)/parallelism")
    // the builder passes the sentinel only when no option is given
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val unsized = new DataDbScanBuilder(Map("path" -> dir))
      .build().asInstanceOf[DataDbScan]
    assert(unsized.maxSplitBytes === DataDbScan.AdaptiveSplitBytes)
    val sized = new DataDbScanBuilder(
      Map("path" -> dir, "maxsplitbytes" -> "2048"))
      .build().asInstanceOf[DataDbScan]
    assert(sized.maxSplitBytes === 2048L)
    // an unsized (adaptive) read returns exactly the explicit read's rows
    val a = spark.read.format("sstable-data").load(dir)
    val b = spark.read.format("sstable-data")
      .option("maxSplitBytes", "2048").load(dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("column pruning reaches the reader's projection") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val one = DataDb.read(spark, dir).select("size_bytes")
    assert(one.schema.fieldNames.toSeq === Seq("size_bytes"))
    val expected = Fixtures.cells(spark, Sf0001)
      .agg(sum("size_bytes")).collect()(0).getLong(0)
    assert(one.agg(sum("size_bytes")).collect()(0).getLong(0) === expected)
    // the physical scan description carries the pruned ReadSchema
    val desc = one.queryExecution.executedPlan.toString
    assert(desc.contains("ReadSchema=size_bytes") ||
      !desc.contains("timestamp_us"))
  }

  test("raw scans execute through the vectorized (columnar) read path") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val df = DataDb.read(spark, dir)
      .groupBy("sstable_id").agg(sum("size_bytes").as("s"))
    df.collect()
    // AQE's final plan must show the batch->row transition, i.e. the scan
    // produced ColumnarBatches (values verified equal by the tests above)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("sstable-data streams newly arrived files exactly once") {
    import java.nio.file.Files
    val src = java.nio.file.Paths.get(DataDbFixture.ensureFiles(spark, Sf0001))
    val dir = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-stream-in"))
    val ckpt = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-stream-ckpt"))
    def arrive(id: String): Unit =
      Seq(DataDbFormat.Suffix, graft.sources.indexdb.IndexDbFormat.Suffix)
        .foreach(sfx => Files.copy(src.resolve(id + sfx), dir.resolve(id + sfx)))
    val outDir = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-stream-out"))
    // AvailableNow: drain everything not yet committed to the checkpoint,
    // then stop — each call is one "catch-up" round against the directory.
    // Sink is the (checkpoint-recoverable) file sink; rows accumulate.
    def drain(): Long = {
      val q = spark.readStream.format("sstable-data").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.read.parquet(outDir.toString).count()
    }
    val bySst = Fixtures.cells(spark, Sf0001).groupBy("sstable_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    arrive("sst-0"); arrive("sst-1")
    assert(drain() === bySst("sst-0") + bySst("sst-1"))
    arrive("sst-2")
    // same checkpoint: only the newly arrived sstable is appended
    assert(drain() === bySst("sst-0") + bySst("sst-1") + bySst("sst-2"))
  }

  test("live cfstats totals over the sstable stream equal the batch form") {
    val dir = DataDbFixture.ensureFiles(spark, Sf0001)
    val q = graft.streaming.StreamingStats.liveCfStatsTotals(spark, dir)
      .writeStream.format("memory").queryName("live_cfstats")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("live_cfstats")
    val batch = DataDb.read(spark, dir)
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("live"),
        sum("size_bytes").as("size"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("live cfstats over REAL-format (cassandra 'nb', compressed) " +
      "sstables: stream equals batch through the same codec") {
    val dir = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val q = graft.streaming.StreamingStats.liveCfStatsTotals(spark, dir,
        format = DataDbScan.FormatCassandra)
      .writeStream.format("memory").queryName("live_cfstats_cass")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("live_cfstats_cass")
    val batch = spark.read.format("sstable-data")
      .option("format", DataDbScan.FormatCassandra).load(dir)
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("live"),
        sum("size_bytes").as("size"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming anti-entropy frontier (q181): the standing token-leaf " +
      "digest over arriving real sstables equals the batch digest " +
      "(round 14)") {
    val dir = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val streamed = graft.streaming.StreamingStats
      .leafDigestOnce(spark, Sf0001)
    val batch = graft.ops.AntiEntropy.tokenLeafDigest(
      DataDb.cells(spark, dir, format = DataDbScan.FormatCassandra))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // a second invocation (fresh memory-sink name) works in the same
    // session — the q181 entry runs more than once per Verify/Bench
    assert(graft.streaming.StreamingStats.leafDigestOnce(spark, Sf0001)
      .count() === streamed.count())
  }

  test("the feature set's typed kinds (static/liveness/deletion events) " +
      "flow through the micro-batch stream identically to the batch scan") {
    val dir = CassandraDataFixture.ensureFeatureFiles(spark, Sf0001)
    val q = spark.readStream.format("sstable-data")
      .option("format", DataDbScan.FormatCassandra)
      .load(dir)
      .groupBy("kind").count()
      .writeStream.format("memory").queryName("live_kinds")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("live_kinds")
    val batch = spark.read.format("sstable-data")
      .option("format", DataDbScan.FormatCassandra).load(dir)
      .groupBy("kind").count()
    assert(streamed.count() === 6) // all six kinds present
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }
}
