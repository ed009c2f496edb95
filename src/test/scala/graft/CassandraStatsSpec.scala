package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import graft.sources.statsdb.{CassandraStatsFixture, CassandraStatsFormat, StatsDb}

/** The REAL-format Statistics.db path (CassandraStatsFormat): envelope
  * checksums, TOC-directed component skipping, EstimatedHistogram /
  * TombstoneHistogram semantics, full codec roundtrip, and the q62
  * DSv2 read. */
class CassandraStatsSpec extends SparkSpec {

  import CassandraStatsFormat._

  private def sample(repairedAt: Long) = File(
    Validation("org.apache.cassandra.dht.Murmur3Partitioner", 0.01),
    Stats(
      partitionSize = EstimatedHistogram(Array(100L, 5000L), Array(9L, 1L, 0L)),
      columnCount = EstimatedHistogram(Array(4L, 90L), Array(9L, 1L, 0L)),
      commitLogUpper = CommitLogPosition(1700001L, 2048),
      minTimestampUs = 5L, maxTimestampUs = (1L << 41) + 9L,
      minLocalDeletionTimeS = 123, maxLocalDeletionTimeS = Int.MaxValue,
      minTtlS = 0, maxTtlS = 86400,
      compressionRatio = 0.6000000001,
      tombstones = TombstoneHistogram(Array(1000.0, 3000.0), Array(40L, 17L)),
      level = 3, repairedAtMs = repairedAt,
      minClustering = Seq(Array[Byte](1, 2), Array[Byte](3)),
      maxClustering = Seq(Array[Byte](9, 8, 7)),
      hasLegacyCounterShards = false,
      totalColumnsSet = 777L, totalRows = 10L,
      commitLogLower = CommitLogPosition(1700000L, 0),
      commitLogIntervals = Seq(
        (CommitLogPosition(1700000L, 0), CommitLogPosition(1700001L, 2048))),
      pendingRepair = if (repairedAt == 0) Some((11L, -22L)) else None,
      isTransient = false))

  private def bytesOf(f: File): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    CassandraStatsFormat.write(new DataOutputStream(bos), f)
    bos.toByteArray
  }

  test("codec round-trips every StatsMetadata field (nb gate set)") {
    Seq(sample(0L), sample((1L << 35) + 1L)).foreach { f =>
      val got = parse(bytesOf(f))
      assert(got.validation === f.validation)
      val (a, b) = (got.stats, f.stats)
      assert(a.partitionSize.offsets.toSeq === b.partitionSize.offsets.toSeq)
      assert(a.partitionSize.buckets.toSeq === b.partitionSize.buckets.toSeq)
      assert(a.columnCount.buckets.toSeq === b.columnCount.buckets.toSeq)
      assert(a.commitLogUpper === b.commitLogUpper)
      assert(a.minTimestampUs === b.minTimestampUs)
      assert(a.maxTimestampUs === b.maxTimestampUs)
      assert(a.minLocalDeletionTimeS === b.minLocalDeletionTimeS)
      assert(a.maxLocalDeletionTimeS === b.maxLocalDeletionTimeS)
      assert(a.minTtlS === b.minTtlS && a.maxTtlS === b.maxTtlS)
      assert(a.compressionRatio === b.compressionRatio)
      assert(a.tombstones.points.toSeq === b.tombstones.points.toSeq)
      assert(a.tombstones.values.toSeq === b.tombstones.values.toSeq)
      assert(a.level === b.level && a.repairedAtMs === b.repairedAtMs)
      assert(a.minClustering.map(_.toSeq) === b.minClustering.map(_.toSeq))
      assert(a.maxClustering.map(_.toSeq) === b.maxClustering.map(_.toSeq))
      assert(a.hasLegacyCounterShards === b.hasLegacyCounterShards)
      assert(a.totalColumnsSet === b.totalColumnsSet)
      assert(a.totalRows === b.totalRows)
      assert(a.commitLogLower === b.commitLogLower)
      assert(a.commitLogIntervals === b.commitLogIntervals)
      assert(a.pendingRepair === b.pendingRepair)
      assert(a.isTransient === b.isTransient)
    }
  }

  test("version-gated tail: nc hostId only, oa full tail, nb none — " +
      "roundtrip at each gate") {
    val tail = VersionedTail(
      originatingHostId = Some((0x1234L, -0x5678L)),
      hasPartitionLevelDeletions = true,
      firstKey = Array[Byte](0, 0, 0, 0, 0, 0, 3, -31),
      lastKey = Array[Byte](0, 0, 0, 0, 0, 0, 7, 99),
      tokenSpaceCoverage = 0.4375)
    val f = {
      val base = sample(0L)
      base.copy(stats = base.stats.copy(tail = Some(tail)))
    }
    def bytesAt(version: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      CassandraStatsFormat.write(new DataOutputStream(bos), f,
        version = version)
      bos.toByteArray
    }
    // nb: tail not written, parse returns None — byte-identical to no tail
    assert(bytesAt("nb").toSeq === bytesOf(sample(0L)).toSeq)
    assert(parse(bytesAt("nb"), "nb").stats.tail === None)
    // nc: hostId only
    val nc = parse(bytesAt("nc"), "nc").stats.tail.get
    assert(nc.originatingHostId === Some((0x1234L, -0x5678L)))
    assert(nc.firstKey.isEmpty && nc.lastKey.isEmpty)
    // oa: the full tail
    val oa = parse(bytesAt("oa"), "oa").stats.tail.get
    assert(oa.originatingHostId === Some((0x1234L, -0x5678L)))
    assert(oa.hasPartitionLevelDeletions)
    assert(oa.firstKey.toSeq === tail.firstKey.toSeq)
    assert(oa.lastKey.toSeq === tail.lastKey.toSeq)
    assert(oa.tokenSpaceCoverage === 0.4375)
    // null hostId flag byte
    val g = f.copy(stats = f.stats.copy(tail = Some(
      tail.copy(originatingHostId = None))))
    val bos = new ByteArrayOutputStream()
    CassandraStatsFormat.write(new DataOutputStream(bos), g, version = "oa")
    assert(parse(bos.toByteArray, "oa").stats.tail.get.originatingHostId
      === None)
  }

  test("q77 op: oa fixture files parse with the deterministic tail") {
    val rows = StatsDb.readOaTail(spark,
      CassandraStatsFixture.ensureOaFiles(spark, Sf0001)).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val g = r.getAs[Long]("generation")
      assert(r.getAs[Long]("host_id_msb") === g * 1000003L)
      assert(r.getAs[Long]("host_id_lsb") === g * 2000003L)
      assert(r.getAs[Boolean]("has_partition_deletions") === (g % 2 == 0))
      assert(r.getAs[Long]("first_key") === g * 1000L + 1L)
      assert(r.getAs[Long]("last_key") === g * 1000L + 999L)
      assert(r.getAs[Long]("total_rows") > 0L)
    }
  }

  test("oa covered-clustering slice: roundtrip with NULL/EMPTY flags, " +
      "multi-block headers, and legacy section replacement") {
    // values exercise every flag class, and 40 components forces TWO
    // 32-component header blocks (block-relative bit positions)
    val start = ClusteringBound(KindInclStartBound,
      (0 until 40).map { i =>
        if (i % 7 == 3) None // NULL
        else if (i % 5 == 0) Some(Array.emptyByteArray) // EMPTY
        else Some(Array.tabulate(1 + i % 3)(b => (i + b).toByte))
      })
    val end = ClusteringBound(KindExclEndBound,
      Seq(Some(Array[Byte](9, 8)), None))
    val tail = VersionedTail(
      originatingHostId = Some((1L, 2L)),
      hasPartitionLevelDeletions = false,
      firstKey = Array[Byte](1), lastKey = Array[Byte](2),
      tokenSpaceCoverage = 0.5)
    val f = {
      val base = sample(0L)
      base.copy(stats = base.stats.copy(tail = Some(tail),
        coveredClustering = Some(CoveredSlice(start, end))))
    }
    val bos = new ByteArrayOutputStream()
    CassandraStatsFormat.write(new DataOutputStream(bos), f, version = "oa")
    val got = parse(bos.toByteArray, "oa").stats
    val s = got.coveredClustering.get
    assert(s.start.kind === KindInclStartBound)
    assert(s.end.kind === KindExclEndBound)
    assert(s.start.values.map(_.map(_.toSeq)) ===
      start.values.map(_.map(_.toSeq)))
    assert(s.end.values.map(_.map(_.toSeq)) === end.values.map(_.map(_.toSeq)))
    // the legacy blob lists are NOT on disk in oa — parse returns empty
    assert(got.minClustering.isEmpty && got.maxClustering.isEmpty)
    // and every post-slice field still parses at the shifted layout
    assert(got.totalColumnsSet === 777L && got.totalRows === 10L)
    // absent slice writes Slice.ALL (BOTTOM, TOP)
    val noSlice = {
      val base = sample(0L)
      base.copy(stats = base.stats.copy(tail = Some(tail)))
    }
    val bos2 = new ByteArrayOutputStream()
    CassandraStatsFormat.write(new DataOutputStream(bos2), noSlice,
      version = "oa")
    val all = parse(bos2.toByteArray, "oa").stats.coveredClustering.get
    assert(all.start === ClusteringBound(KindInclStartBound, Nil))
    assert(all.end === ClusteringBound(KindInclEndBound, Nil))
  }

  test("q100 op: oa fixture slices match the generation derivation") {
    val rows = StatsDb.readOaSlice(spark,
      CassandraStatsFixture.ensureOaFiles(spark, Sf0001)).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val g = r.getAs[Long]("generation")
      val k1 = g % 2 + 1
      val k2 = g % 3 + 1
      assert(r.getAs[Long]("start_kind") === 1L)
      assert(r.getAs[Long]("end_kind") === 6L)
      assert(r.getAs[Long]("start_components") ===
        k1 + (if (g % 2 == 0) 1 else 0) + (if (g % 3 == 0) 1 else 0))
      assert(r.getAs[Long]("end_components") === k2)
      assert(r.getAs[Long]("start_null_count") === (if (g % 3 == 0) 1L else 0L))
      assert(r.getAs[Long]("start_empty_count") === (if (g % 2 == 0) 1L else 0L))
      assert(r.getAs[Long]("start_bytes_sum") ===
        k1 * (4 * g + 6) + 2 * k1 * (k1 - 1))
      assert(r.getAs[Long]("end_bytes_sum") ===
        k2 * (8 * g + 6) + 2 * k2 * (k2 - 1))
    }
  }

  test("every checksum class is verified: count, TOC, component") {
    val good = bytesOf(sample(7L))
    // count checksum: flip a bit in the count int
    val c1 = good.clone(); c1(3) = (c1(3) ^ 1).toByte
    val e1 = intercept[java.io.IOException](parse(c1))
    assert(e1.getMessage.contains("count checksum"))
    // TOC checksum: flip a bit in the first TOC offset
    val c2 = good.clone(); c2(14) = (c2(14) ^ 1).toByte
    val e2 = intercept[java.io.IOException](parse(c2))
    assert(e2.getMessage.contains("TOC checksum"))
    // component checksum: flip a byte inside the STATS body (last component
    // is HEADER; STATS sits before it — corrupt a byte near the middle)
    val c3 = good.clone(); c3(good.length / 2) = (c3(good.length / 2) ^ 1).toByte
    intercept[java.io.IOException](parse(c3))
  }

  test("unconsumed components are located and skipped via the TOC, " +
      "never parsed") {
    // the COMPACTION blob is opaque filler — if the parser tried to parse
    // it as anything structured it would throw; a successful parse of both
    // consumed components IS the skip proof. Also verify TOC lookup is by
    // type, not position: parse succeeds though STATS is the 3rd entry.
    val f = parse(bytesOf(sample(0L)))
    assert(f.stats.totalColumnsSet === 777L)
  }

  test("EstimatedHistogram max/mean/count match Cassandra semantics") {
    val h = EstimatedHistogram(Array(100L, 5000L), Array(9L, 1L, 0L))
    assert(h.count === 10L)
    assert(h.max === 5000L)
    // ceil((9·100 + 1·5000) / 10) = ceil(590.0) = 590
    assert(h.mean === 590L)
    // overflow bucket nonzero => max is unbounded
    assert(EstimatedHistogram(Array(10L), Array(1L, 2L)).max === Long.MaxValue)
    // empty histogram
    assert(EstimatedHistogram(Array(10L), Array(0L, 0L)).mean === 0L)
    assert(EstimatedHistogram(Array(10L), Array(0L, 0L)).max === 0L)
  }

  test("TombstoneHistogram sum: all-below fast path and trapezoid " +
      "interpolation") {
    val t = TombstoneHistogram(Array(1000.0, 3000.0), Array(40L, 16L))
    // past every bin: plain total
    assert(t.sum(3000.0) === 56.0)
    assert(t.sum(99999.0) === 56.0)
    // below every bin: zero
    assert(t.sum(999.0) === 0.0)
    // midpoint: mb = 40 + (16-40)·0.5 = 28; trapezoid (40+28)·0.25 = 17;
    // + m1/2 = 20 → 37
    assert(t.sum(2000.0) === 37.0)
  }

  test("q62 end-to-end: fixture files parse through the DSv2 with " +
      "field-level equality to the metadata view") {
    import org.apache.spark.sql.functions._
    val dir = Sf0001
    val path = CassandraStatsFixture.ensureFiles(spark, dir)
    val real = StatsDb.readCassandra(spark, path,
      graft.sources.Fixtures.GcBeforeS).orderBy("generation")
    val meta = graft.sources.Fixtures.sstableMeta(
        graft.sources.Fixtures.allPscan(spark, dir))
      .orderBy("sstable_id").collect()
    val rows = real.collect()
    assert(rows.length === meta.length)
    rows.zip(meta).zipWithIndex.foreach { case ((r, m), i) =>
      def L(n: String): Long = m.getLong(m.fieldIndex(n))
      assert(r.getAs[Long]("generation") === i + 1L)
      assert(r.getAs[Long]("partition_size_count") === L("partition_count"))
      assert(r.getAs[Long]("partition_size_max") === L("max_partition_size"))
      assert(r.getAs[Long]("column_count_max") === L("max_column_count"))
      assert(r.getAs[Long]("min_timestamp_us") === L("min_timestamp_us"))
      assert(r.getAs[Long]("total_columns_set") === L("cell_count"))
      assert(r.getAs[Long]("total_rows") === L("partition_count"))
      assert(r.getAs[Boolean]("is_repaired") ===
        m.getBoolean(m.fieldIndex("is_repaired")))
      // trapezoid at b with bins (b−86400, droppable) and (b+86400, 17):
      // mb = m1 + (17−m1)/2, s = (m1+mb)/4 + m1/2
      val m1 = L("droppable_tombstone_count").toDouble
      val mb = m1 + (17.0 - m1) * 86400.0 / 172800.0
      val expect = math.floor(((m1 + mb) * 86400.0 / 345600.0 + m1 / 2.0) * 1000.0).toLong
      assert(r.getAs[Long]("droppable_x1000") === expect)
    }
    // column pruning reaches the reader: a 2-column projection plans
    assert(real.select(col("generation"), col("level")).collect().length ===
      meta.length)
  }
}
