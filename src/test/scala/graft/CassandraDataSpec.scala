package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.compressioninfo.{ChunkedData, CompressionInfoFormat}
import graft.sources.datadb.{CassandraDataFixture, CassandraDataFormat, DataDb, DataDbScan}
import CassandraDataFormat._

/** The REAL Cassandra big-format ('nb') Data.db row codec: header
  * component roundtrip, UnfilteredSerializer row/cell/marker encodings
  * (delta timestamps, subset bitmaps, complex-column cells, empty values),
  * the chunked-LZ4 layer (CRC verification, mid-stream starts, the
  * max_compressed_length raw-chunk rule), and end-to-end DSv2 equivalence
  * — compressed ≡ uncompressed ≡ the parquet relation under the fixture's
  * documented representation mapping. */
class CassandraDataSpec extends SparkSpec {

  private val LongT = Marshal.Prefix + "LongType"
  private val BytesT = Marshal.Prefix + "BytesType"
  private val MapT = Marshal.Prefix + s"MapType($LongT,$BytesT)"

  private def cspec(name: String, tpe: String) =
    ColumnSpec(name.getBytes("UTF-8"), tpe)

  test("SerializationHeader component round-trips (negative epoch deltas)") {
    val h = SerializationHeaderInfo(
      minTimestampUs = 700L * 86400000000L, // far BELOW the 2015 epoch
      minLocalDeletionTimeS = 700L * 86400L,
      minTtlS = 0L,
      keyType = LongT,
      clusteringTypes = Seq(LongT),
      staticColumns = Nil,
      regularColumns = Seq(cspec("c0", MapT), cspec("simple", BytesT)))
    val parsed = parseHeader(serializeHeader(h))
    assert(parsed.minTimestampUs === h.minTimestampUs)
    assert(parsed.minLocalDeletionTimeS === h.minLocalDeletionTimeS)
    assert(parsed.minTtlS === h.minTtlS)
    assert(parsed.keyType === h.keyType)
    assert(parsed.clusteringTypes === h.clusteringTypes)
    assert(parsed.regularColumns.map(_.name) === Seq("c0", "simple"))
    assert(parsed.regularColumns.map(_.typeName) === Seq(MapT, BytesT))
    assert(parsed.regularColumns.head.isComplex)
    assert(!parsed.regularColumns(1).isComplex)
  }

  test("marshal registry: fixed lengths, complex value types") {
    assert(Marshal.fixedLen(LongT) === 8)
    assert(Marshal.fixedLen(Marshal.Prefix + "UUIDType") === 16)
    assert(Marshal.fixedLen(BytesT) === -1)
    assert(Marshal.isComplex(MapT))
    assert(Marshal.complexValueType(MapT) === Some(BytesT))
    assert(Marshal.complexValueType(
      Marshal.Prefix + s"SetType($LongT)") === None)
    assert(Marshal.complexValueType(
      Marshal.Prefix + s"ListType($BytesT)") === Some(BytesT))
    // nested parameter: the top-level comma split must not cut inside it
    val nested = Marshal.Prefix +
      s"MapType(${Marshal.Prefix}MapType($LongT,$LongT),$BytesT)"
    assert(Marshal.complexValueType(nested) === Some(BytesT))
  }

  private def roundtrip(header: SerializationHeaderInfo,
      write: Writer => Unit): List[graft.sources.datadb.DataDbFormat.Event] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val w = new Writer(out, header)
    write(w)
    events(new ByteArrayInputStream(bos.toByteArray), header).toList
  }

  test("rows, complex cells, markers and sentinels round-trip") {
    val header = SerializationHeaderInfo(
      minTimestampUs = 1000L, minLocalDeletionTimeS = 500L, minTtlS = 0L,
      keyType = LongT, clusteringTypes = Seq(LongT), staticColumns = Nil,
      regularColumns = Seq(cspec("c0", MapT), cspec("c1", MapT)))
    def path(i: Long) =
      java.nio.ByteBuffer.allocate(8).putLong(i).array()
    val got = roundtrip(header, { w =>
      w.writePartitionStart(Array[Byte](0, 0, 0, 0, 0, 0, 0, 9))
      // marker before the row at the same clustering
      w.write(WriteMarker(1L, KindInclStartBound, 5000L, 700L))
      w.write(WriteRow(1L, Seq(
        // two cells in ONE complex column (the multi-cell mapping)
        WriteCell(0, path(1), isDeleted = false, isExpiring = false,
          timestampUs = 1000L, ttlS = -1L, localDeletionTimeS = 0L,
          value = Array[Byte](1, 2, 3)),
        WriteCell(0, path(2), isDeleted = true, isExpiring = false,
          timestampUs = 2000L, ttlS = -1L, localDeletionTimeS = 600L,
          value = null),
        // expiring cell with the live-sentinel deletion time
        WriteCell(1, path(1), isDeleted = false, isExpiring = true,
          timestampUs = 3000L, ttlS = 86400L,
          localDeletionTimeS = NoDeletionTimeS,
          value = Array.emptyByteArray))))
      w.writePartitionEnd()
    })
    assert(got.map(_.isMarker) === List(true, false, false, false))
    assert(got.map(_.clustering) === List(1L, 1L, 1L, 1L))
    assert(got.map(_.columnName) === List("range:1", "c0", "c0", "c1"))
    assert(got.map(_.timestampUs) === List(5000L, 1000L, 2000L, 3000L))
    // deleted and non-expiring cells read back NO_TTL; only the expiring
    // one keeps its TTL
    assert(got.map(_.ttlS) === List(NoTtlS, NoTtlS, NoTtlS, 86400L))
    // live non-expiring cells read back the live sentinel
    assert(got.map(_.localDeletionTimeS) ===
      List(700L, NoDeletionTimeS, 600L, NoDeletionTimeS))
    assert(got.map(_.isTombstone) === List(true, false, true, false))
    assert(got.map(_.isExpiring) === List(false, false, false, true))
    assert(got.map(_.isLive) === List(false, true, false, true))
    // size = value length; deleted/empty cells and markers are 0
    assert(got.map(_.sizeBytes) === List(0L, 3L, 0L, 0L))
    assert(got.forall(e =>
      java.nio.ByteBuffer.wrap(e.key).getLong === 9L))
  }

  test("static rows, pk liveness, row deletions and complex deletions " +
      "surface as typed events (round 9) and round-trip exactly") {
    val header = SerializationHeaderInfo(
      minTimestampUs = 1000L, minLocalDeletionTimeS = 500L, minTtlS = 0L,
      keyType = LongT, clusteringTypes = Seq(LongT),
      staticColumns = Seq(cspec("s0", BytesT)),
      regularColumns = Seq(cspec("c0", BytesT), cspec("tags", MapT)))
    def path(i: Long) =
      java.nio.ByteBuffer.allocate(8).putLong(i).array()
    val got = roundtrip(header, { w =>
      // a real partition-level deletion surfaces first (round 9)
      w.writePartitionStart(Array[Byte](0, 0, 0, 0, 0, 0, 0, 7),
        deletion = Some((9999L, 777L)))
      w.write(WriteStaticRow(Seq(
        WriteCell(0, path = null, isDeleted = false, isExpiring = false,
          timestampUs = 1111L, ttlS = NoTtlS,
          localDeletionTimeS = NoDeletionTimeS,
          value = Array[Byte](9, 9))),
        pkLiveness = Some((1200L, NoTtlS, NoDeletionTimeS)),
        rowDeletion = Some((1300L, 555L))))
      w.write(WriteRow(3L,
        cells = Seq(
          WriteCell(0, path = null, isDeleted = false, isExpiring = false,
            timestampUs = 2222L, ttlS = NoTtlS,
            localDeletionTimeS = NoDeletionTimeS,
            value = Array[Byte](1)),
          WriteCell(1, path(1), isDeleted = false, isExpiring = false,
            timestampUs = 3333L, ttlS = NoTtlS,
            localDeletionTimeS = NoDeletionTimeS,
            value = Array[Byte](2, 2))),
        pkLiveness = Some((1500L, 3600L, 777L)),
        rowDeletion = Some((4444L, 888L)),
        complexDeletion = Some((5555L, 999L))))
      // second row: liveness WITHOUT a row TTL (HAS_TIMESTAMP only)
      w.write(WriteRow(4L,
        cells = Seq(WriteCell(0, path = null, isDeleted = false,
          isExpiring = false, timestampUs = 6666L, ttlS = NoTtlS,
          localDeletionTimeS = NoDeletionTimeS, value = Array[Byte](3))),
        pkLiveness = Some((1600L, NoTtlS, NoDeletionTimeS))))
      w.writePartitionEnd()
    })
    import graft.sources.datadb.DataDbFormat._
    assert(got.map(_.kindCode) === List(KindCodePartitionDeletion,
      KindCodeRowLiveness, KindCodeRowDeletion, KindCodeStaticCell,
      KindCodeRowLiveness, KindCodeRowDeletion, KindCodeCell,
      KindCodeComplexDeletion, KindCodeCell,
      KindCodeRowLiveness, KindCodeCell))
    assert(got.map(_.clustering) === List(PartitionClustering,
      StaticClustering,
      StaticClustering, StaticClustering, 3L, 3L, 3L, 3L, 3L, 4L, 4L))
    assert(got.map(_.columnName) ===
      List("", "", "", "s0", "", "", "c0", "tags", "tags", "", "c0"))
    assert(got.map(_.timestampUs) === List(9999L, 1200L, 1300L, 1111L, 1500L,
      4444L, 2222L, 5555L, 3333L, 1600L, 6666L))
    assert(got.map(_.ttlS) === List(NoTtlS, NoTtlS, NoTtlS, NoTtlS, 3600L,
      NoTtlS,
      NoTtlS, NoTtlS, NoTtlS, NoTtlS, NoTtlS))
    assert(got.map(_.localDeletionTimeS) === List(777L, NoDeletionTimeS, 555L,
      NoDeletionTimeS, 777L, 888L, NoDeletionTimeS, 999L, NoDeletionTimeS,
      NoDeletionTimeS, NoDeletionTimeS))
    assert(got.map(_.sizeBytes) ===
      List(0L, 0L, 0L, 2L, 0L, 0L, 1L, 0L, 2L, 0L, 1L))
    assert(got.head.isTombstone && !got.head.isLive)
    // liveness is live (and expiring when a row TTL rides it); deletions
    // are tombstones — at the static sentinel and at real clusterings
    val sliv = got(1); val sdel = got(2)
    assert(sliv.isLive && !sliv.isExpiring && !sliv.isTombstone)
    assert(sdel.isTombstone && !sdel.isLive)
    val live = got(4); val rdel = got(5); val cdel = got(7)
    assert(live.isLive && live.isExpiring && !live.isTombstone)
    assert(!got(9).isExpiring && got(9).isLive)
    assert(rdel.isTombstone && !rdel.isLive)
    assert(cdel.isTombstone && !cdel.isLive)
  }

  test("complex STATIC columns round-trip: path-ordered multi-cell " +
      "statics, static complex deletion, subset bitmap (round 9)") {
    val header = SerializationHeaderInfo(
      minTimestampUs = 1000L, minLocalDeletionTimeS = 400L, minTtlS = 0L,
      keyType = LongT, clusteringTypes = Seq(LongT),
      staticColumns = Seq(cspec("s0", BytesT), cspec("stags", MapT)),
      regularColumns = Seq(cspec("c0", BytesT)))
    def path(i: Long) =
      java.nio.ByteBuffer.allocate(8).putLong(i).array()
    val got = roundtrip(header, { w =>
      w.writePartitionStart(Array[Byte](0, 0, 0, 0, 0, 0, 0, 1))
      // both statics present (HAS_ALL_COLUMNS): complex deletion rides
      // the complex static, cells in path order, liveness first
      w.write(WriteStaticRow(
        WriteCell(0, path = null, isDeleted = false, isExpiring = false,
          timestampUs = 1111L, ttlS = NoTtlS,
          localDeletionTimeS = NoDeletionTimeS,
          value = Array[Byte](9, 9)) +: Seq(
          WriteCell(1, path(1), isDeleted = false, isExpiring = false,
            timestampUs = 2000L, ttlS = NoTtlS,
            localDeletionTimeS = NoDeletionTimeS, value = Array[Byte](1)),
          WriteCell(1, path(2), isDeleted = false, isExpiring = false,
            timestampUs = 2001L, ttlS = NoTtlS,
            localDeletionTimeS = NoDeletionTimeS,
            value = Array[Byte](2, 2))),
        pkLiveness = Some((1200L, NoTtlS, NoDeletionTimeS)),
        complexDeletion = Some((1500L, 444L))))
      w.write(WriteRow(3L, Seq(
        WriteCell(0, path = null, isDeleted = false, isExpiring = false,
          timestampUs = 3000L, ttlS = NoTtlS,
          localDeletionTimeS = NoDeletionTimeS, value = Array[Byte](7)))))
      w.writePartitionEnd()
      // second partition: ONLY the complex static present → subset
      // bitmap path with a complex static, no deletion, zero extras
      w.writePartitionStart(Array[Byte](0, 0, 0, 0, 0, 0, 0, 2))
      w.write(WriteStaticRow(Seq(
        WriteCell(1, path(5), isDeleted = false, isExpiring = false,
          timestampUs = 4000L, ttlS = NoTtlS,
          localDeletionTimeS = NoDeletionTimeS, value = Array[Byte](4)))))
      w.writePartitionEnd()
    })
    import graft.sources.datadb.DataDbFormat._
    assert(got.map(_.kindCode) === List(
      KindCodeRowLiveness, KindCodeStaticCell, KindCodeComplexDeletion,
      KindCodeStaticCell, KindCodeStaticCell, KindCodeCell,
      KindCodeStaticCell))
    assert(got.map(_.columnName) ===
      List("", "s0", "stags", "stags", "stags", "c0", "stags"))
    assert(got.map(_.clustering) === List(StaticClustering,
      StaticClustering, StaticClustering, StaticClustering,
      StaticClustering, 3L, StaticClustering))
    assert(got.map(_.timestampUs) ===
      List(1200L, 1111L, 1500L, 2000L, 2001L, 3000L, 4000L))
    assert(got.map(_.sizeBytes) === List(0L, 2L, 0L, 1L, 2L, 1L, 1L))
    val cdel = got(2)
    assert(cdel.isTombstone && !cdel.isLive &&
      cdel.localDeletionTimeS === 444L)
    // the two partitions' keys arrive in order
    assert(got.map(e => java.nio.ByteBuffer.wrap(e.key).getLong).distinct
      === List(1L, 2L))
  }

  test("the DSv2 cassandra scan serves the feature set's typed kinds " +
      "through the production path (header from Statistics.db)") {
    import graft.sources.datadb.DataDbFormat
    val path = CassandraDataFixture.ensureFeatureFiles(spark, Sf0001)
    val df = DataDb.read(spark, path, format = DataDbScan.FormatCassandra)
    val byKind = df.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet === Set("CELL", "STATIC_CELL", "ROW_LIVENESS",
      "ROW_DELETION", "COMPLEX_DELETION", "PARTITION_DELETION"))
    // cross-check against the q110 binaryFile rollup — same files, two
    // independent read paths
    val q110 = graft.ops.Integrity.rowLevelEvents(spark, Sf0001).collect()
    def tot(c: String) = q110.map(_.getAs[Long](c)).sum
    assert(byKind("STATIC_CELL") === tot("statics"))
    assert(byKind("ROW_LIVENESS") === tot("liveness"))
    assert(byKind("ROW_DELETION") === tot("row_dels"))
    assert(byKind("COMPLEX_DELETION") === tot("complex_dels"))
    assert(byKind("CELL") === tot("cells"))
    assert(byKind("PARTITION_DELETION") === tot("part_dels"))
    // the static clustering sentinel flows through the relational surface
    assert(df.where(col("clustering") === DataDbFormat.StaticClustering &&
      col("kind") === "STATIC_CELL").count() === byKind("STATIC_CELL"))
    // partition deletions surface at their own sentinel, one per deleted
    // partition, before anything else in it
    assert(df.where(col("clustering") === DataDbFormat.PartitionClustering)
      .select("kind").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("PARTITION_DELETION"))
    // round 11: the feature set carries the complete sidecar family, so
    // a small split size plans multiple partition-boundary ranges per
    // file (task count tracks data volume) with the relation unchanged
    val whole = df.rdd.getNumPartitions
    val split = DataDb.read(spark, path,
      maxSplitBytes = Some(4096L), format = DataDbScan.FormatCassandra)
    assert(split.rdd.getNumPartitions > whole)
    assert(split.count() === df.count())
  }

  test("column-subset bitmap and simple columns round-trip") {
    val header = SerializationHeaderInfo(
      minTimestampUs = 0L, minLocalDeletionTimeS = 0L, minTtlS = 0L,
      keyType = LongT, clusteringTypes = Seq(LongT), staticColumns = Nil,
      regularColumns = Seq(cspec("a", BytesT), cspec("b", BytesT),
        cspec("c", Marshal.Prefix + "LongType")))
    val got = roundtrip(header, { w =>
      w.writePartitionStart(Array[Byte](1))
      // only column b present → HAS_ALL_COLUMNS unset, bitmap 0b101
      w.write(WriteRow(7L, Seq(
        WriteCell(1, null, isDeleted = false, isExpiring = false,
          timestampUs = 42L, ttlS = -1L, localDeletionTimeS = 0L,
          value = Array[Byte](9, 9)))))
      // fixed-length simple column (LongType value: raw 8 bytes, no vint)
      w.write(WriteRow(8L, Seq(
        WriteCell(2, null, isDeleted = false, isExpiring = false,
          timestampUs = 43L, ttlS = -1L, localDeletionTimeS = 0L,
          value = java.nio.ByteBuffer.allocate(8).putLong(77L).array()))))
      w.writePartitionEnd()
    })
    assert(got.map(_.columnName) === List("b", "c"))
    assert(got.map(_.clustering) === List(7L, 8L))
    assert(got.map(_.sizeBytes) === List(2L, 8L))
  }

  test("chunked LZ4 layer: roundtrip, mid-stream starts, CRC, raw chunks") {
    val data = Array.tabulate(100000)(i => (i * 7 + (i >> 8)).toByte)
    def compress(maxCompressed: Int): (Array[Byte], CompressionInfoFormat.Info) = {
      val bos = new ByteArrayOutputStream()
      val c = new ChunkedData.ChunkingOutputStream(bos, 4096, maxCompressed)
      c.write(data)
      val (len, offsets) = c.finish()
      assert(len === data.length.toLong)
      (bos.toByteArray,
        CompressionInfoFormat.Info("LZ4Compressor", Nil, 4096, maxCompressed,
          len, offsets))
    }
    def sourceOf(bytes: Array[Byte]) = new ChunkedData.RandomAccess {
      override def readFully(pos: Long, buf: Array[Byte], off: Int,
          len: Int): Unit = System.arraycopy(bytes, pos.toInt, buf, off, len)
      override def close(): Unit = ()
    }
    val (compressed, info) = compress(Int.MaxValue)
    assert(info.offsets.length === (data.length + 4095) / 4096)
    // full read and mid-stream starts (chunk-aligned and not)
    Seq(0L, 4096L, 5000L, 99999L).foreach { start =>
      val in = new ChunkedData.ChunkedInputStream(sourceOf(compressed), info,
        compressed.length.toLong, start)
      val got = in.readAllBytes()
      assert(got.length === data.length - start.toInt, s"start=$start")
      assert(got.toSeq === data.drop(start.toInt).toSeq, s"start=$start")
    }
    // CRC failure surfaces, never silent corruption
    val corrupted = compressed.clone()
    corrupted(10) = (corrupted(10) ^ 0x40).toByte
    val ex = intercept[java.io.IOException] {
      new ChunkedData.ChunkedInputStream(sourceOf(corrupted), info,
        corrupted.length.toLong, 0L).readAllBytes()
    }
    assert(ex.getMessage.contains("checksum"))
    // max_compressed_length=1 forces every chunk raw; still byte-identical
    val (raw, rawInfo) = compress(1)
    assert(raw.length === data.length + 4 * rawInfo.offsets.length)
    val gotRaw = new ChunkedData.ChunkedInputStream(sourceOf(raw), rawInfo,
      raw.length.toLong, 0L).readAllBytes()
    assert(gotRaw.toSeq === data.toSeq)
  }

  test("all four published chunk codecs: roundtrip, mid-stream starts, " +
      "raw-store rule, name lookup") {
    import graft.sources.compressioninfo.Compressors
    val data = Array.tabulate(100000)(i => (i * 7 + (i >> 8)).toByte)
    def sourceOf(bytes: Array[Byte]) = new ChunkedData.RandomAccess {
      override def readFully(pos: Long, buf: Array[Byte], off: Int,
          len: Int): Unit = System.arraycopy(bytes, pos.toInt, buf, off, len)
      override def close(): Unit = ()
    }
    Compressors.All.foreach { codec =>
      def compress(maxCompressed: Int): (Array[Byte], CompressionInfoFormat.Info) = {
        val bos = new ByteArrayOutputStream()
        val c = new ChunkedData.ChunkingOutputStream(bos, 4096, maxCompressed,
          codec)
        c.write(data)
        val (len, offsets) = c.finish()
        (bos.toByteArray,
          CompressionInfoFormat.Info(codec.name, Nil, 4096, maxCompressed,
            len, offsets))
      }
      val (compressed, info) = compress(Int.MaxValue)
      // mid-stream starts prove chunkFor + skip-into-chunk per codec
      Seq(0L, 4096L, 5000L).foreach { start =>
        val got = new ChunkedData.ChunkedInputStream(sourceOf(compressed),
          info, compressed.length.toLong, start).readAllBytes()
        assert(got.toSeq === data.drop(start.toInt).toSeq,
          s"${codec.name} start=$start")
      }
      // max_compressed_length=1 forces every chunk raw for ANY codec
      val (raw, rawInfo) = compress(1)
      assert(raw.length === data.length + 4 * rawInfo.offsets.length,
        codec.name)
      val gotRaw = new ChunkedData.ChunkedInputStream(sourceOf(raw), rawInfo,
        raw.length.toLong, 0L).readAllBytes()
      assert(gotRaw.toSeq === data.toSeq, codec.name)
    }
    // name lookup: simple and fully-qualified spellings; unknown rejected
    assert(Compressors.byName(
      "org.apache.cassandra.io.compress.ZstdCompressor").name ===
      "ZstdCompressor")
    val ex = intercept[java.io.IOException] {
      Compressors.byName("BrotliCompressor")
    }
    assert(ex.getMessage.contains("unsupported compressor"))
  }

  test("multi-codec sstable set: every codec's files decode to the same " +
      "relation as the uncompressed set") {
    val plain = DataDb.cells(spark,
      CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = false),
      format = DataDbScan.FormatCassandra)
    val mcPath = CassandraDataFixture.ensureMultiCodecFiles(spark, Sf0001)
    val mc = DataDb.cells(spark, mcPath, format = DataDbScan.FormatCassandra)
    // all four codec names actually present in the set's chunk maps
    val codecs = graft.sources.compressioninfo.CompressionInfo
      .read(spark, mcPath).select("compressor").distinct()
      .collect().map(_.getString(0)).sorted
    assert(codecs.toSeq === Seq("DeflateCompressor", "LZ4Compressor",
      "SnappyCompressor", "ZstdCompressor"))
    val cols = Seq("sstable_id", "key", "clustering", "column_name", "kind",
      "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
      "is_expiring", "is_live", "size_bytes").map(col)
    assert(mc.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty)
    assert(plain.select(cols: _*).exceptAll(mc.select(cols: _*)).isEmpty)
  }

  test("wide-partition set: mid-partition ranges at promoted-index block " +
      "boundaries preserve the relation") {
    import graft.sources.datadb.{DataDbInputPartition, DataDbScanBuilder}
    val path = CassandraDataFixture.ensureWideFiles(spark, Sf0001)
    val b = new DataDbScanBuilder(Map("path" -> path,
      "maxsplitbytes" -> "1024", "format" -> DataDbScan.FormatCassandra))
    val parts = b.build().asInstanceOf[graft.sources.datadb.DataDbScan]
      .planInputPartitions()
      .map(_.asInstanceOf[DataDbInputPartition])
    val mids = parts.count(_.midPartitionKey != null)
    assert(mids > 0, s"no mid-partition ranges in ${parts.length} splits")
    // ranges tile each file's logical byte range: start 0, contiguous
    parts.groupBy(_.file).foreach { case (f, ps) =>
      val sorted = ps.sortBy(_.start)
      assert(sorted.head.start === 0L, f)
      sorted.sliding(2).foreach {
        case Array(a, b2) => assert(a.end === b2.start, s"gap in $f")
        case _ => ()
      }
    }
    // fine-grained mid-partition ranges == one-split-per-file read
    val fine = DataDb.cells(spark, path, maxSplitBytes = Some(1024L),
      format = DataDbScan.FormatCassandra)
    val whole = DataDb.cells(spark, path,
      format = DataDbScan.FormatCassandra)
    assert(fine.rdd.getNumPartitions > whole.rdd.getNumPartitions)
    assert(fine.exceptAll(whole).isEmpty && whole.exceptAll(fine).isEmpty)
  }

  test("slice read: promoted-index clustering bounds prune blocks; " +
      "in-range events match the full scan; empty slices read nothing") {
    val path = CassandraDataFixture.ensureWideFiles(spark, Sf0001)
    val slices = graft.ops.SliceGet.sliceRead(spark, Sf0001).collect()
    val cells = DataDb.cells(spark, path,
        format = DataDbScan.FormatCassandra)
      .select(col("key"), col("clustering")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxCl = cells.map(_._2).max
    slices.foreach { r =>
      val (k, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val truth = cells.count(c => c._1 == k && c._2 >= lo && c._2 <= hi)
      assert(r.getLong(4) === truth.toLong, s"events k=$k [$lo,$hi]")
      // a slice beyond the clustering domain reads ZERO blocks — the
      // bounds prune, they don't merely label
      if (lo > maxCl)
        assert(r.getLong(3) === 0L, s"empty slice k=$k [$lo,$hi] read blocks")
    }
    // at sf0.001 the domain tops out well under the k>=2 bands, so the
    // zero-read branch is actually exercised
    assert(slices.exists(r => r.getLong(1) > maxCl))
  }

  test("point-get: bloom/summary/index path returns exactly the mapped " +
      "relation; absent keys never reach Data.db") {
    import graft.ops.PointGet
    PointGet.bloomChecks.reset(); PointGet.bloomRejects.reset()
    PointGet.indexScans.reset(); PointGet.dataReads.reset()
    // unsorted form: the sorted query's range-sampling pass would run the
    // probe map twice and double the access-path counters
    val rows = PointGet.pointGetUnsorted(spark, Sf0001).collect()
    val present = rows.filter(_.getLong(0) > 0)
    val absent = rows.filter(_.getLong(0) < 0)
    assert(present.nonEmpty && absent.nonEmpty)
    assert(present.length === absent.length)
    // absent probes are all-zero regardless of bloom false positives
    assert(absent.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 &&
      r.getLong(3) == 0 && r.getLong(4) == 0))
    // every present probe resolves, and the event totals match the truth
    assert(present.forall(_.getLong(1) > 0))
    val expectEvents = graft.sources.Fixtures.cells(spark, Sf0001)
      .where(col("tbl") === "lineitem" && col("key") % 7 === 0 &&
        col("key") > 0)
      .count()
    assert(present.map(_.getLong(2)).sum === expectEvents)
    // access-path pruning: blooms reject (absent keys mostly die there),
    // and Data.db is read EXACTLY once per (present probe, holding
    // sstable) — never for an absent probe
    assert(PointGet.bloomRejects.sum > 0)
    assert(PointGet.dataReads.sum === present.map(_.getLong(1)).sum)
    // summary-bounded index scans stay bounded by bloom passes
    assert(PointGet.indexScans.sum <= PointGet.bloomChecks.sum)
  }

  test("Filter.db: serialize/parse roundtrip, no false negatives, rare " +
      "false positives") {
    import graft.sources.filterdb.FilterDbFormat
    val f = FilterDbFormat.create(1000L)
    def keyBytes(i: Long) =
      java.nio.ByteBuffer.allocate(8).putLong(i).array()
    (0L until 1000L).foreach(i => f.add(keyBytes(i * 7)))
    val bos = new ByteArrayOutputStream()
    FilterDbFormat.write(new DataOutputStream(bos), f)
    val parsed = FilterDbFormat.parse(new java.io.DataInputStream(
      new ByteArrayInputStream(bos.toByteArray)))
    assert(parsed.hashCount === f.hashCount)
    // the defining contract: NO false negatives
    assert((0L until 1000L).forall(i => parsed.mightContain(keyBytes(i * 7))))
    // absent keys: false positives must be rare at ~10 bits/key (p≈0.01)
    val fp = (0L until 1000L).count(i =>
      parsed.mightContain(keyBytes(i * 7 + 3)))
    assert(fp < 50, s"false-positive rate implausible: $fp/1000")
    // murmur3 quirk coverage: tail bytes >= 0x80 (sign-extension path)
    // still roundtrip membership
    val high = Array.tabulate[Byte](11)(i => (0x80 + i).toByte)
    f.add(high)
    assert(f.mightContain(high))
  }

  test("bloom membership and digest verification ops") {
    val bloom = graft.ops.Integrity.bloomMembership(spark, Sf0001).collect()
    assert(bloom.length === 6)
    bloom.foreach { r =>
      assert(r.getAs[Long]("found") === r.getAs[Long]("partitions"),
        s"false negative in ${r.getAs[String]("sstable_id")}")
    }
    val digest = graft.ops.Integrity.digestVerify(spark, Sf0001).collect()
    assert(digest.length === 1)
    assert(digest.head.getAs[Long]("sstables") === 12L)
    assert(digest.head.getAs[Long]("matches") === 12L)
  }

  test("Summary.db: serialize/parse roundtrip incl. LE offsets/positions " +
      "and the first/last-key tail") {
    import graft.sources.summarydb.SummaryDbFormat
    def k(s: String) = s.getBytes("UTF-8")
    val entries = Vector(
      SummaryDbFormat.Entry(k("alpha"), 0L),
      SummaryDbFormat.Entry(k("mid"), 4096L),
      // positions past 2^31 exercise the full le64 path
      SummaryDbFormat.Entry(k("zz-last-key"), 0x1_2345_6789L))
    val s = SummaryDbFormat.Summary(128, 128, 3, entries, k("aa"), k("zzz"))
    val bos = new ByteArrayOutputStream()
    SummaryDbFormat.write(new DataOutputStream(bos), s)
    val got = SummaryDbFormat.parse(new java.io.DataInputStream(
      new ByteArrayInputStream(bos.toByteArray)))
    assert(got.minIndexInterval === 128)
    assert(got.samplingLevel === 128)
    assert(got.sizeAtFullSampling === 3)
    assert(got.entries.map(_.position) === Seq(0L, 4096L, 0x1_2345_6789L))
    assert(got.entries.map(e => new String(e.key, "UTF-8")) ===
      Seq("alpha", "mid", "zz-last-key"))
    assert(new String(got.firstKey, "UTF-8") === "aa")
    assert(new String(got.lastKey, "UTF-8") === "zzz")
    // the header is BE while offsets are LE: a parser reading offsets BE
    // would mis-slice every entry after the first — pin byte layout
    val raw = bos.toByteArray
    val bb = java.nio.ByteBuffer.wrap(raw)
    assert(bb.getInt(0) === 128) // minIndexInterval, big-endian
    assert(bb.getInt(4) === 3) // offsetCount, big-endian
    // first offset le32 at byte 24 = 0; second = 5+8 = 13 stored LE
    assert(raw(24) === 0 && raw(25) === 0 && raw(26) === 0 && raw(27) === 0)
    assert(raw(28) === 13.toByte && raw(29) === 0)
  }

  test("summary roundtrip op: entries sample every 4th partition and all " +
      "positions resolve to matching Index.db entries") {
    val rows = graft.ops.Integrity.summaryRoundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("positions_ok") === r.getAs[Long]("entries"),
        s"dangling summary position in ${r.getAs[String]("sstable_id")}")
      assert(r.getAs[Long]("min_interval") === 4L)
      assert(r.getAs[Long]("first_key") <= r.getAs[Long]("last_key"))
    }
  }

  test("promoted index: serialize/parse roundtrip incl. offsets table, " +
      "width delta base, bound vs clustering prefixes, open marker") {
    val blocks = Vector(
      CassandraDataFormat.IndexInfo(
        CassandraDataFormat.KindInclStartBound, 0L,
        CassandraDataFormat.KindClustering, 2L,
        offset = 22L, width = 130L, endOpenMarker = None),
      CassandraDataFormat.IndexInfo(
        CassandraDataFormat.KindClustering, 0L,
        CassandraDataFormat.KindClustering, 1L,
        offset = 152L, width = 70000L, // > WidthBase: negative delta path
        endOpenMarker = Some((123456789L, 86400L))))
    val p = CassandraDataFormat.PromotedIndex(22L, 2147483647L,
      Long.MinValue, blocks)
    val bytes = CassandraDataFormat.serializePromotedIndex(p)
    val got = CassandraDataFormat.parsePromotedIndex(bytes)
    assert(got.headerLength === 22L)
    assert(got.deletionLdtS === 2147483647L)
    assert(got.deletionMfdaUs === Long.MinValue)
    assert(got.blocks === blocks)
    // a corrupted offsets table must fail loudly, not mis-seek
    val corrupt = bytes.clone()
    corrupt(bytes.length - 1) = (corrupt(bytes.length - 1) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      CassandraDataFormat.parsePromotedIndex(corrupt)
    }
  }

  test("row index op: blocks tile every indexed partition and boundaries " +
      "follow the RowsPerBlock rule") {
    val rows = graft.ops.Integrity.rowIndex(spark, Sf0001).collect()
    assert(rows.length === 6)
    var indexedTotal = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("tiled_ok") === r.getAs[Long]("indexed"),
        s"non-tiling promoted index in ${r.getAs[String]("sstable_id")}")
      assert(r.getAs[Long]("indexed") <= r.getAs[Long]("partitions"))
      indexedTotal += r.getAs[Long]("indexed")
    }
    assert(indexedTotal > 0L, "fixture produced no indexed partitions")
  }

  test("end-to-end: real-format files match the mapped parquet relation; " +
      "compressed ≡ uncompressed ≡ single-split") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(col("clustering")).as("cl_sum"),
        sum(col("timestamp_us") % 1000003L)
          .as("ts_sum"),
        sum(col("size_bytes")).as("sz_sum"),
        sum(when(col("is_tombstone"), 1L)
          .otherwise(0L)).as("tombs"))
      .orderBy("sstable_id").collect().toSeq

    val uncompressedPath =
      CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = false)
    val compressedPath =
      CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = true)
    // tiny splits force several partition-boundary splits per file; the
    // compressed read must plan on UNCOMPRESSED length and map offsets
    // through the chunk table
    val u = DataDb.read(spark, uncompressedPath,
      maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
    val c = DataDb.read(spark, compressedPath,
      maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
    val single = DataDb.read(spark, uncompressedPath,
      maxSplitBytes = None, format = DataDbScan.FormatCassandra)
    assert(agg(u) === agg(single))
    assert(agg(u) === agg(c))

    // the mapped parquet relation: value length = size_bytes % 61 (0 when
    // deleted), no TTL on deleted cells, same event multiset otherwise
    val mapped = graft.sources.Fixtures.cells(spark, Sf0001)
      .withColumn("sstable_id",
        concat(lit("nb-"),
          (regexp_extract(col("sstable_id"),
            "sst-(\\d+)", 1).cast("long") + 1L).cast("string"),
          lit("-big")))
      .withColumn("size_bytes",
        when(col("is_tombstone"), 0L)
          .otherwise(col("size_bytes") % 61L))
    assert(agg(u) === agg(mapped))
  }

  test("CRC.db: codec round-trips; verification catches one flipped byte") {
    import graft.sources.crcdb.CrcDbFormat
    // codec roundtrip at awkward lengths (empty tail chunk boundary, 1-byte
    // tail, exact multiple)
    for (len <- Seq(1, 100, 8192, 8193, 16384)) {
      val bytes = Array.tabulate(len)(i => (i * 31 + 7).toByte)
      val crcs = CrcDbFormat.chunkCrcs(bytes, 8192)
      assert(crcs.length === (len + 8191) / 8192)
      val bos = new ByteArrayOutputStream()
      CrcDbFormat.write(new DataOutputStream(bos),
        CrcDbFormat.Crc(8192, crcs))
      val enc = bos.toByteArray
      val parsed = CrcDbFormat.parse(new java.io.DataInputStream(
        new ByteArrayInputStream(enc)), enc.length.toLong)
      assert(parsed === CrcDbFormat.Crc(8192, crcs))
    }

    // positive: the real fixture set verifies clean
    val ok = graft.ops.Integrity.crcVerify(spark, Sf0001).collect()
    assert(ok.length === 6)
    ok.foreach(r => assert(r.getAs[Long]("crc_ok") === 1L))

    // negative: copy the set, flip ONE byte in one Data.db — exactly that
    // sstable must fail
    val src = new java.io.File(graft.sources.datadb.CassandraDataFixture
      .ensureFiles(spark, Sf0001, compressed = false))
    val mut = java.nio.file.Files.createTempDirectory("graft-crc-mut")
    graft.sources.TempDirs.register(mut)
    src.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, mut.resolve(f.getName))
    }
    val victim = mut.resolve("nb-1-big-Data.db")
    val bytes = java.nio.file.Files.readAllBytes(victim)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    java.nio.file.Files.write(victim, bytes)
    val res = graft.ops.Integrity.crcVerifyAt(spark, mut.toString).collect()
      .map(r => r.getAs[String]("sstable_id") -> r.getAs[Long]("crc_ok"))
      .toMap
    assert(res("sst-0") === 0L, "corruption went undetected")
    assert(res.count(_._2 == 1L) === 5, "corruption bled into other files")
  }

  test("q82: real-format pstats tiles every sstable's uncompressed length") {
    val rows = SparkEntry.queries("q82_pstats_from_cassandra")(spark, Sf0001)
      .collect()
    assert(rows.length === 6)
    rows.foreach(r => assert(r.getAs[Long]("tiled_ok") === 1L,
      s"index offset-deltas do not tile ${r.getAs[String]("sstable_id")}"))
    // partition counts agree with the parquet relation per sstable
    val expect = graft.sources.Fixtures.cells(spark, Sf0001)
      .select(col("sstable_id"), col("key")).distinct()
      .groupBy("sstable_id").count().collect()
      .map(r => r.getAs[String]("sstable_id") -> r.getAs[Long]("count"))
      .toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("partition_count") ===
        expect(r.getAs[String]("sstable_id"))))
  }

  test("q83: purge off real compressed sstables == purge over mapped cells") {
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq).toSeq
    val real = SparkEntry.queries("q83_purge_from_cassandra")(spark, Sf0001)
      .collect()
    assert(real.nonEmpty)
    // the real codec stores actual value bytes, so cell size off the scan
    // is the mapped value length (size_bytes % 61, 0 for tombstones) —
    // recompute purge over the parquet relation under that same mapping
    val mapped = graft.sources.Fixtures.cells(spark, Sf0001)
      .withColumn("size_bytes",
        when(col("is_tombstone"), 0L).otherwise(col("size_bytes") % 61L))
    val expect = graft.ops.Purge.perPartition(mapped)
      .select("key", "key_formatted", "table_count", "size", "reclaimable")
      .orderBy(desc("reclaimable"), desc("size"), asc("key"))
      .limit(10)
      .collect()
    assert(canon(real) === canon(expect),
      "the codec/compression roundtrip leaked into purge semantics")
  }

  test("DSv2 writer: df.write.format(sstable-data) produces complete real " +
      "sstables; Catalyst plans the clustering exchange; read-back matches " +
      "the fixture relation (round 10)") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(col("clustering")).as("cl_sum"),
        sum(col("timestamp_us") % 1000003L).as("ts_sum"),
        sum(col("size_bytes")).as("sz_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombs"))
      .orderBy("sstable_id").collect().toSeq

    val out = java.nio.file.Files.createTempDirectory("graft-writer-spec")
    try {
      val cells = graft.sources.Fixtures.cells(spark, Sf0001)
        .where(col("tbl") === "lineitem")
        .select("sstable_id", "key", "clustering", "column_name", "kind",
          "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
          "is_expiring", "size_bytes")
      // adversarial upstream partitioning: rows of one sstable_id start
      // scattered over 13 partitions — the Write's required clustered
      // distribution + ordering must co-locate and order them, or ids
      // would straddle tasks and generations would collide/duplicate
      cells.repartition(13, col("timestamp_us"))
        .write.format("sstable-data")
        .option("path", out.toString).option("compressed", "true")
        .mode("append").save()

      // exactly one complete sidecar family per generation
      val names = Option(out.toFile.listFiles()).get.map(_.getName).toSet
      val gens = names.collect { case n if n.endsWith("-Data.db") =>
        n.stripSuffix("-Data.db")
      }
      assert(gens === Set("nb-1-big", "nb-2-big", "nb-3-big", "nb-4-big",
        "nb-5-big", "nb-6-big"))
      for (g <- gens; c <- Seq("-Data.db", "-Index.db", "-Statistics.db",
          "-Filter.db", "-Summary.db", "-Digest.crc32", "-TOC.txt",
          "-CompressionInfo.db"))
        assert(names.contains(g + c), s"missing $g$c")

      // read-back through the production cassandra scan equals the
      // serial fixture path's relation (same representation mapping)
      val expectPath =
        CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = true)
      val got = DataDb.read(spark, out.toString,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      val expect = DataDb.read(spark, expectPath,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      assert(agg(got) === agg(expect))

      // schema validation: a missing required column is rejected up front
      val err = intercept[IllegalArgumentException] {
        cells.drop("timestamp_us").write.format("sstable-data")
          .option("path", out.toString).mode("append").save()
      }
      assert(err.getMessage.contains("timestamp_us"))
    } finally {
      Option(out.toFile.listFiles()).foreach(_.foreach(_.delete()))
      java.nio.file.Files.deleteIfExists(out)
    }
  }

  test("DSv2 writer spill: a generation many times the spill threshold " +
      "writes through sorted runs + k-way merge, byte-equal read-back " +
      "(round 11)") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(col("clustering")).as("cl_sum"),
        sum(col("timestamp_us") % 1000003L).as("ts_sum"),
        sum(col("size_bytes")).as("sz_sum"),
        sum(crc32(col("value"))).as("value_crc_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombs"))
      .orderBy("sstable_id").collect().toSeq
    val outSpill = java.nio.file.Files.createTempDirectory("graft-spill-a")
    val outPlain = java.nio.file.Files.createTempDirectory("graft-spill-b")
    try {
      val cells = graft.sources.Fixtures.cells(spark, Sf0001)
        .where(col("tbl") === "lineitem")
        .select(col("sstable_id"), col("key"), col("clustering"),
          col("column_name"), col("kind"), col("timestamp_us"),
          col("ttl_s"), col("local_deletion_time_s"), col("is_tombstone"),
          col("is_expiring"), col("size_bytes"),
          when(col("kind") === "CELL" && !col("is_tombstone"),
            concat(col("key"), lit("#"), col("timestamp_us"))
              .cast("binary")).as("value"))
      val before = graft.sources.datadb.DataDbWrite.spills.sum()
      // threshold of 97 rows: each ~1000-event generation spills ~10
      // sorted runs, so live heap held <100 rows while writing it
      cells.write.format("sstable-data")
        .option("path", outSpill.toString).option("compressed", "true")
        .option("spillRows", "97")
        .mode("append").save()
      assert(graft.sources.datadb.DataDbWrite.spills.sum() > before,
        "the spill path must actually engage under a tiny threshold")
      // the BYTE cap trips independently of the row cap (rows are a
      // proxy; large values must bound memory too)
      val beforeBytes = graft.sources.datadb.DataDbWrite.spills.sum()
      val outBytes = java.nio.file.Files.createTempDirectory("graft-spill-c")
      try {
        cells.write.format("sstable-data")
          .option("path", outBytes.toString).option("compressed", "true")
          .option("spillBytes", "8192")
          .mode("append").save()
        assert(graft.sources.datadb.DataDbWrite.spills.sum() > beforeBytes,
          "the byte cap must engage under a tiny spillBytes")
      } finally {
        Option(outBytes.toFile.listFiles()).foreach(_.foreach(_.delete()))
        java.nio.file.Files.deleteIfExists(outBytes)
      }
      cells.write.format("sstable-data")
        .option("path", outPlain.toString).option("compressed", "true")
        .mode("append").save()
      // spilled and unspilled outputs carry the same complete sidecar
      // family per generation (tie order among fully-equal sort keys may
      // differ between the in-memory sort and the run merge, so the
      // contract is the file SET plus the read-back MULTISET — the same
      // contract the writer has toward its nondeterministically-ordered
      // upstream exchange)
      val spillNames = Option(outSpill.toFile.listFiles()).get
        .map(_.getName).sorted
      val plainNames = Option(outPlain.toFile.listFiles()).get
        .map(_.getName).sorted
      assert(spillNames.toSeq === plainNames.toSeq)
      // the read-back relation (with values) matches
      val got = DataDb.read(spark, outSpill.toString,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      val expect = DataDb.read(spark, outPlain.toString,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      assert(agg(got) === agg(expect))
    } finally {
      Seq(outSpill, outPlain).foreach { d =>
        Option(d.toFile.listFiles()).foreach(_.foreach(_.delete()))
        java.nio.file.Files.deleteIfExists(d)
      }
    }
  }

  test("DSv2 FEATURE writer spill: a shard many times the spill " +
      "threshold writes through sorted runs + k-way merge into the " +
      "streaming kernel, equal file set + read-back (round 13)") {
    import graft.ops.FeatureCompaction
    // input: a valid feature event relation — the compacted output's own
    // events, which the kernel provably reassembles (they round-trip)
    val compacted = FeatureCompaction.ensureCompacted(spark, Sf0001,
      FeatureCompaction.GcA)
    val ev = DataDb.read(spark, compacted,
        format = DataDbScan.FormatCassandra)
      .withColumn("k", graft.sources.BinaryKeys.beLong(col("key")))
      .select(
        regexp_extract(col("sstable_id"), "fb-(\\d+)", 0).as("sstable_id"),
        col("k").as("key"), col("clustering"),
        col("column_name"), col("kind"), col("timestamp_us"),
        col("ttl_s"), col("local_deletion_time_s"), col("value"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("k", graft.sources.BinaryKeys.beLong(col("key")))
      .groupBy("sstable_id", "kind")
      .agg(count(lit(1)).as("events"),
        sum(col("k") % 1000003L).as("key_sum"),
        sum(col("clustering")).as("cl_sum"),
        sum(col("timestamp_us") % 1000003L).as("ts_sum"),
        sum(col("ttl_s")).as("ttl_sum"),
        sum(col("local_deletion_time_s") % 1000003L).as("ldt_sum"),
        sum(crc32(col("value"))).as("value_crc_sum"))
      .orderBy("sstable_id", "kind").collect().toSeq
    val outSpill = java.nio.file.Files.createTempDirectory("graft-fspill-a")
    val outPlain = java.nio.file.Files.createTempDirectory("graft-fspill-b")
    try {
      val before = graft.sources.datadb.DataDbWrite.spills.sum()
      ev.write.format("sstable-data")
        .option("path", outSpill.toString).option("schema", "feature")
        .option("spillRows", "13")
        .mode("append").save()
      assert(graft.sources.datadb.DataDbWrite.spills.sum() > before,
        "the feature spill path must actually engage under a tiny " +
          "threshold")
      ev.write.format("sstable-data")
        .option("path", outPlain.toString).option("schema", "feature")
        .mode("append").save()
      // same complete sidecar family per output shard, and the same
      // read-back MULTISET (tie order among fully-equal sort keys may
      // differ between the in-memory sort and the run merge)
      val spillNames = Option(outSpill.toFile.listFiles()).get
        .map(_.getName).sorted
      val plainNames = Option(outPlain.toFile.listFiles()).get
        .map(_.getName).sorted
      assert(spillNames.toSeq === plainNames.toSeq)
      val got = DataDb.read(spark, outSpill.toString,
        format = DataDbScan.FormatCassandra)
      val expect = DataDb.read(spark, outPlain.toString,
        format = DataDbScan.FormatCassandra)
      assert(agg(got) === agg(expect))
      // and the rewrite round-trips the compacted relation itself
      assert(agg(got) === agg(DataDb.read(spark, compacted,
        format = DataDbScan.FormatCassandra)))
    } finally {
      Seq(outSpill, outPlain).foreach { d =>
        Option(d.toFile.listFiles()).foreach(_.foreach(_.delete()))
        java.nio.file.Files.deleteIfExists(d)
      }
    }
  }

  test("point-read pushdown: pushed key filters plan exactly the probed " +
      "partitions' byte ranges; absent keys plan nothing (round 10)") {
    val path = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val presentKeys = graft.sources.Fixtures.cells(spark, Sf0001)
      .select("key").distinct().orderBy("key").limit(3)
      .collect().map(_.getLong(0))
    val absentKeys = presentKeys.map(-_ - 1L)
    def bytesOf(ks: Seq[Long]) = ks.map(k =>
      java.nio.ByteBuffer.allocate(8).putLong(k).array())
    def scan(ks: Seq[Long]) = DataDb.read(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .where(col("key").isin(bytesOf(ks): _*))

    // exact task economy: one planned range per (sstable, present key)
    // pair — the q114 access path executed at PLANNING time
    val expectedRanges = graft.sources.Fixtures.cells(spark, Sf0001)
      .where(col("key").isin(presentKeys: _*))
      .select("sstable_id", "key").distinct().count()
    val both = scan(presentKeys ++ absentKeys)
    assert(both.rdd.getNumPartitions === expectedRanges,
      "pushed key filters must plan single-partition ranges")
    // the pushed filter is visible in the scan description — a refactor
    // that silently stops pushing breaks here, not just in timing
    assert(both.queryExecution.executedPlan.toString.contains("In(key"),
      "key filter not pushed into the scan")
    assert(scan(absentKeys).rdd.getNumPartitions === 0,
      "absent keys must be pruned at planning (bloom/index)")
    // without pushdown the same files plan MANY splits
    val fullSplits = DataDb.read(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .rdd.getNumPartitions
    assert(fullSplits > expectedRanges)

    // relation parity vs the UNPUSHED form (filter on the decoded long
    // blocks pushdown, forcing the full scan)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("key")
      .agg(count(lit(1)).as("events"),
        sum(col("clustering")).as("cl"),
        sum(col("timestamp_us") % 1000003L).as("ts"),
        sum(col("size_bytes")).as("sz"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    val pushed = agg(both
      .withColumn("key", graft.sources.BinaryKeys.beLong(col("key"))))
    val baseline = agg(DataDb.cells(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .where(col("key").isin((presentKeys ++ absentKeys): _*)))
    assert(pushed === baseline)
    assert(pushed.map(_.head) === presentKeys.map(k => k: Any).toSeq)

    // the engine-format fixture has Index.db but NO Summary.db/Filter.db:
    // the planner's no-summary fallback (whole-index binary search, no
    // bloom) must plan the same exact ranges for the graft codec
    val gpath = graft.sources.datadb.DataDbFixture.ensureFiles(spark, Sf0001)
    val gscan = DataDb.read(spark, gpath,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatGraft)
      .where(col("key").isin(bytesOf(presentKeys ++ absentKeys): _*))
    assert(gscan.rdd.getNumPartitions === expectedRanges)
    val gagg = agg(gscan
      .withColumn("key", graft.sources.BinaryKeys.beLong(col("key"))))
    val gbase = agg(DataDb.cells(spark, gpath,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatGraft)
      .where(col("key").isin((presentKeys ++ absentKeys): _*)))
    assert(gagg === gbase)
  }

  test("runtime filtering: a realized key/id set prunes files and plans " +
      "point ranges at execution time; unusable shapes fall back exactly " +
      "(round 11)") {
    import graft.sources.datadb.{DataDbFormat, DataDbInputPartition, DataDbScan => Scan}
    import org.apache.spark.sql.sources.{GreaterThan, In}
    val path = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val presentKeys = graft.sources.Fixtures.cells(spark, Sf0001)
      .select("key").distinct().orderBy("key").limit(3)
      .collect().map(_.getLong(0))
    def bytesOf(ks: Seq[Long]): Array[Any] = ks.map(k =>
      java.nio.ByteBuffer.allocate(8).putLong(k).array(): Any).toArray
    def freshScan() = Scan(path, DataDbFormat.Schema, Array.empty,
      8L << 10, Scan.FormatCassandra)
    val full = freshScan().planInputPartitions().length
    // a runtime key set plans EXACTLY the static pushdown's economy: one
    // range per (sstable, present key); planInputPartitions runs after
    // filter(), so pruning happens before any task exists
    val expectedRanges = graft.sources.Fixtures.cells(spark, Sf0001)
      .where(col("key").isin(presentKeys: _*))
      .select("sstable_id", "key").distinct().count()
    val keyScan = freshScan()
    keyScan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("key", bytesOf(presentKeys))))
    assert(keyScan.planInputPartitions().length === expectedRanges)
    // absent keys: zero partitions (bloom/index pruning is strict)
    val absentScan = freshScan()
    absentScan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("key", bytesOf(presentKeys.map(-_ - 1L)))))
    assert(absentScan.planInputPartitions().length === 0)
    // runtime sstable_id set prunes whole files
    val idScan = freshScan()
    idScan.filter(Array[org.apache.spark.sql.sources.Filter](
      In("sstable_id", Array[Any]("nb-1-big"))))
    val idParts = idScan.planInputPartitions()
    assert(idParts.nonEmpty && idParts.forall(
      _.asInstanceOf[DataDbInputPartition].sstableId == "nb-1-big"))
    assert(idParts.length < full)
    // exact fallback: a filter shape the scan cannot use leaves the full
    // split plan untouched (Spark's residual keeps row-level exactness)
    val fbScan = freshScan()
    fbScan.filter(Array[org.apache.spark.sql.sources.Filter](
      GreaterThan("timestamp_us", 0L)))
    assert(fbScan.planInputPartitions().length === full)
    // and the END-TO-END injection: the q165 join routes its realized
    // probe table into the scan as a dynamic-pruning subquery (the plan
    // carries the expression; a planner/config drift that stops
    // injecting breaks here, not just in timing)
    val df = SparkEntry.queries("q165_scan_runtime_point")(spark, Sf0001)
    assert(df.queryExecution.executedPlan.toString
      .contains("dynamicpruning"),
      "runtime filter not injected for the join-shaped point read")
  }

  test("sidecar runtime filtering: stats/summary/compression scans " +
      "prune files under a realized generation set; unusable shapes " +
      "fall back exactly (round 13)") {
    import org.apache.spark.sql.sources.{GreaterThan, In}
    val path = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val nFiles = Option(new java.io.File(path)
      .listFiles((_, n) => n.endsWith("-Data.db"))).get.length
    assert(nFiles > 1)
    def genFilter(g: Long) = Array[org.apache.spark.sql.sources.Filter](
      In("generation", Array[Any](g)))
    def fallback = Array[org.apache.spark.sql.sources.Filter](
      GreaterThan("data_length", 0L))
    // sstable-stats (cassandra schema, generation attribute)
    def statsScan() = graft.sources.statsdb.StatsDbScan(path,
      graft.sources.statsdb.CassandraStatsFormat.Schema, Array.empty,
      1, "cassandra", 0L)
    assert(statsScan().planInputPartitions().length === nFiles)
    val sRt = statsScan(); sRt.filter(genFilter(2L))
    assert(sRt.planInputPartitions().length === 1)
    val sFb = statsScan(); sFb.filter(fallback)
    assert(sFb.planInputPartitions().length === nFiles)
    // sstable-summary (round 13 source)
    def sumScan() = graft.sources.summarydb.SummaryDbScan(path,
      graft.sources.summarydb.SummaryDbDataSource.Schema, Array.empty, 1)
    assert(sumScan().planInputPartitions().length === nFiles)
    val suRt = sumScan(); suRt.filter(genFilter(2L))
    assert(suRt.planInputPartitions().length === 1)
    // sstable-compression
    def ciScan() = graft.sources.compressioninfo.CompressionInfoScan(path,
      graft.sources.compressioninfo.CompressionInfoFormat.Schema, 1)
    assert(ciScan().planInputPartitions().length === nFiles)
    val ciRt = ciScan(); ciRt.filter(genFilter(2L))
    assert(ciRt.planInputPartitions().length === 1)
    val ciFb = ciScan(); ciFb.filter(fallback)
    assert(ciFb.planInputPartitions().length === nFiles)
    // STATIC pushdown reaches the file plan through the DataFrame API too
    val pushedCi = graft.sources.compressioninfo.CompressionInfo
      .read(spark, path).where(col("generation") === 2L)
    val scans = pushedCi.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scans.contains("pushed=") && scans.contains("generation"),
      scans)
    assert(pushedCi.select("generation").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // and the summary DSv2's relation matches the raw binary parse
    val viaSource = spark.read.format("sstable-summary").load(path)
      .agg(count(lit(1)), sum("position"),
        sum(crc32(col("key"))), countDistinct("generation"))
      .collect().head.toSeq
    val viaBinary = {
      val files = Option(new java.io.File(path)
        .listFiles((_, n) => n.endsWith("-Summary.db"))).get
      val all = files.flatMap { f =>
        val s = graft.sources.summarydb.SummaryDbFormat.parse(
          new java.io.DataInputStream(new java.io.BufferedInputStream(
            new java.io.FileInputStream(f))))
        s.entries.map(e => (f.getName, e))
      }
      val crc = new java.util.zip.CRC32()
      Seq(all.length.toLong, all.map(_._2.position).sum,
        all.map { case (_, e) =>
          crc.reset(); crc.update(e.key); crc.getValue
        }.sum, files.length.toLong)
    }
    assert(viaSource === viaBinary)
  }

  test("value passthrough: arbitrary caller bytes survive write -> scan " +
      "byte-for-byte; valueless events surface null (round 10)") {
    val out = java.nio.file.Files.createTempDirectory("graft-value-spec")
    try {
      // 16 arbitrary bytes per live cell (md5 digests: full byte range,
      // not UTF-8) — content fidelity, not just lengths
      val cells = graft.sources.Fixtures.cells(spark, Sf0001)
        .where(col("tbl") === "lineitem")
        .select(col("sstable_id"), col("key"), col("clustering"),
          col("column_name"), col("kind"), col("timestamp_us"),
          col("ttl_s"), col("local_deletion_time_s"), col("is_tombstone"),
          col("is_expiring"), col("size_bytes"),
          when(col("kind") === "CELL" && !col("is_tombstone"),
            unhex(md5(concat_ws(":", col("key"), col("clustering"),
              col("timestamp_us"), col("column_name"))))).as("value"))
      cells.write.format("sstable-data")
        .option("path", out.toString).option("compressed", "true")
        .mode("append").save()
      val back = DataDb.read(spark, out.toString,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      def sums(df: org.apache.spark.sql.DataFrame) = df
        .agg(count(lit(1)), count(col("value")),
          sum(crc32(col("value"))), sum(length(col("value"))))
        .head.toSeq
      assert(sums(back) === sums(cells))
      // valueless events (tombstone cells, markers) come back null
      assert(back.where(col("is_tombstone") && col("value").isNotNull)
        .count() === 0L)
      // a scan that does not ask for `value` still reads everything
      // (retention is pruning-gated)
      assert(back.drop("value").count() ===
        cells.count())
    } finally {
      Option(out.toFile.listFiles()).foreach(_.foreach(_.delete()))
      java.nio.file.Files.deleteIfExists(out)
    }
  }

  test("co-partitioned deletion joins: a DENSE deletion set computes " +
      "the identical survivor relation with no broadcast in the plan " +
      "(round 13)") {
    import graft.ops.FeatureCompaction
    import graft.sources.datadb.DataDbFormat
    // dense-modulus synthetic frame: EVERY partition carries a partition
    // deletion, every row a row deletion, every column a complex
    // deletion — the deletion-heavy corpus where broadcasting the
    // deletion relations would be the wrong plan
    val keys = spark.range(0, 500).select(col("id").as("k"))
    val rows = keys.crossJoin(
      spark.range(0, 3).select(col("id").as("clustering")))
    def shaped(df: org.apache.spark.sql.DataFrame, cl: org.apache.spark.sql.Column,
        colName: String, kind: String, ts: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
      df.select(col("k"), cl.as("clustering"), lit(colName).as("column_name"),
        lit(kind).as("kind"), ts.as("timestamp_us"), lit(0L).as("ttl_s"),
        lit(Int.MaxValue.toLong).as("local_deletion_time_s"))
    val cells = shaped(rows, col("clustering"), "tags",
      DataDbFormat.KindCell, col("k") * 10L + col("clustering") * 3L)
    val pds = shaped(keys, lit(-2L), "", DataDbFormat.KindPartitionDeletion,
      col("k") * 10L + 1L)
    val rds = shaped(rows, col("clustering"), "",
      DataDbFormat.KindRowDeletion, col("k") * 10L + col("clustering"))
    val cds = shaped(rows, col("clustering"), "tags",
      DataDbFormat.KindComplexDeletion, col("k") * 10L + 2L)
    val ev = cells.unionByName(pds).unionByName(rds).unionByName(cds)
    val bc = FeatureCompaction.survivors(ev, gcBeforeS = 0L)
    val cp = FeatureCompaction.survivors(ev, gcBeforeS = 0L,
      copartitioned = true)
    val plan = cp.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"co-partitioned variant must not broadcast: $plan")
    assert(plan.contains("ShuffledHashJoin"), plan)
    // broadcast variant really broadcasts (the rare-deletion default)
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val cols = Seq("k", "clustering", "column_name", "kind",
      "timestamp_us").map(col)
    val a = cp.select(cols: _*).orderBy(cols: _*).collect().toSeq
    val b = bc.select(cols: _*).orderBy(cols: _*).collect().toSeq
    assert(a === b)
    // the dense deletions actually bite: shadowed events are gone
    assert(a.size.toLong < ev.count())
    assert(a.nonEmpty)
  }

  test("minor compaction: size-tiered selection compacts only populated " +
      "tiers; the PER-TIER conservative purge keeps droppable " +
      "tombstones exactly when any sstable outside that tier's " +
      "compaction holds the key (round 14)") {
    import graft.ops.MinorCompaction
    val tiers = MinorCompaction.tierTable(spark, Sf0001)
    assert(tiers.size === 6)
    val pass = tiers.filterNot(_._3)
    // the (1,1,1,2,4,4)-unit design: the middle singleton passes
    // through, the three small and two large sstables form selected
    // tiers
    assert(pass.map(_._1) === Seq("sst-3"))
    val selSizes = tiers.filter(_._3).groupBy(_._2).values
      .map(_.size).toSet
    assert(selSizes === Set(3, 2))
    // physical: ONE complete compressed family per selected tier
    val out = MinorCompaction.ensureCompacted(spark, Sf0001)
    val names = Option(new java.io.File(out).listFiles()).get.map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) === 2)
    assert(names.count(_.endsWith("-CompressionInfo.db")) === 2)
    // semantics: recompute winners/purge from the input and check the
    // exact identity  merged_events = winners - purged
    val inPath = CassandraDataFixture.ensureTieredFiles(spark, Sf0001)
    def cellsOf(p: String) = DataDb.cells(spark, p,
        format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    val ev = cellsOf(inPath)
    import spark.implicits._
    val tierDf = tiers.filter(_._3).map(t => (t._1, t._2))
      .toDF("sstable_id", "tier")
    val winners = ev.join(broadcast(tierDf), "sstable_id")
      .groupBy("tier", "key", "clustering", "column_name")
      .agg(max(struct(col("timestamp_us"), col("sstable_id"),
        col("size_bytes"), col("is_tombstone"),
        col("local_deletion_time_s"), col("ttl_s"), col("is_expiring"),
        col("kind"))).as("w"))
    val droppable = winners.where(col("w.is_tombstone") &&
      col("w.local_deletion_time_s") < graft.sources.Fixtures.GcBeforeS)
    // the exact per-tier guard relation: (tier, key) present in some
    // sstable OUTSIDE that tier's compaction (passthrough or other tier)
    val groupDf = tiers.map(t =>
        (t._1, if (t._3) t._2 else -1)).toDF("sstable_id", "grp")
    // localCheckpoint breaks the lineage shared with `droppable` (both
    // derive from `ev`), so the joins below are not ambiguous self-joins
    val outKeys = ev.join(broadcast(groupDf), "sstable_id")
      .select(col("grp"), col("key").as("okey")).distinct()
      .localCheckpoint()
    val blocked = droppable.select("tier", "key").distinct()
      .join(outKeys,
        col("key") === col("okey") && col("tier") =!= col("grp"),
        "left_semi")
      .localCheckpoint()
    val purged = droppable.join(blocked, Seq("tier", "key"), "left_anti")
    val retained = droppable.join(blocked, Seq("tier", "key"), "left_semi")
    assert(purged.count() > 0, "some droppable tombstones must purge")
    assert(retained.count() > 0,
      "some droppable tombstones must survive via the per-tier guard")
    val mergedEvents = cellsOf(out).count()
    assert(mergedEvents === winners.count() - purged.count())
    // every retained droppable tombstone in the OUTPUT has its key
    // outside its own tier's compaction (the conservative rule, checked
    // on the real written bytes; output gen 900+t maps back to tier t)
    val outDroppable = cellsOf(out)
      .withColumn("tier",
        (regexp_extract(col("sstable_id"), "sst-(\\d+)", 1).cast("long")
          - MinorCompaction.TierGenBase).cast("int"))
      .where(col("is_tombstone") &&
        col("local_deletion_time_s") < graft.sources.Fixtures.GcBeforeS)
      .select("tier", "key")
    assert(outDroppable.join(outKeys,
      col("key") === col("okey") && col("tier") =!= col("grp"),
      "left_anti").count() === 0)
    // the CROSS-TIER half of the rule is non-vacuous on this fixture: at
    // least one retained tombstone's key lives in NO passthrough sstable
    // (only another selected tier shadows it) — the round-13 rule would
    // have purged it and resurrected that tier's data
    val passOnlyKeys = ev
      .where(col("sstable_id").isin(pass.map(_._1): _*))
      .select("key").distinct()
    assert(retained.join(passOnlyKeys, Seq("key"), "left_anti")
      .count() > 0, "cross-tier shadowing must bite")
  }

  test("leveled compaction: sidecar-driven selection (level from " +
      "Statistics.db, ranges from Summary.db), range-disjointness makes " +
      "purge unconditional, outputs tile the replaced partners " +
      "(round 13)") {
    import graft.ops.LeveledCompaction
    val inPath = CassandraDataFixture.ensureLeveledFiles(spark, Sf0001)
    val meta = LeveledCompaction.metadata(inPath)
    assert(meta.count(_.level == 0) === 2)
    assert(meta.count(_.level == 1) === 4)
    // the leveled invariant, read from the REAL sidecars: L1 ranges are
    // pairwise disjoint and contiguous in key order
    val l1 = meta.filter(_.level == 1).sortBy(_.firstKey)
    l1.sliding(2).foreach {
      case Seq(a, b) => assert(a.lastKey < b.firstKey)
      case _ => ()
    }
    val (l0, partners, pass) = LeveledCompaction.selection(inPath)
    assert(l0.size === 2 && partners.size === 2 && pass.size === 2)
    // the L0 span reaches exactly the middle two ranges
    assert(partners.map(_.sstableId).toSet === Set("sst-3", "sst-4"))
    def cellsOf(p: String) = DataDb.cells(spark, p,
        format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    val ev = cellsOf(inPath)
    val participatingIds = (l0 ++ partners).map(_.sstableId)
    val participating = ev.where(col("sstable_id")
      .isin(participatingIds: _*))
    // the conservative guard set is PROVABLY EMPTY here: no passthrough
    // sstable holds any participating key (leveled ranges partition the
    // key space) — the property that lets LCS purge where STCS retains
    val passKeys = ev.where(col("sstable_id")
      .isin(pass.map(_.sstableId): _*)).select("key").distinct()
    assert(participating.select("key").distinct()
      .join(passKeys, "key").count() === 0)
    // purge is therefore unconditional: droppable tombstones existed in
    // the input and NONE survive in the written output
    val gc = graft.sources.Fixtures.GcBeforeS
    assert(participating.where(col("is_tombstone") &&
      col("local_deletion_time_s") < gc).count() > 0)
    val out = LeveledCompaction.ensureCompacted(spark, Sf0001)
    val merged = cellsOf(out)
    assert(merged.where(col("is_tombstone") &&
      col("local_deletion_time_s") < gc).count() === 0)
    // physical: one complete compressed family per replaced partner,
    // and each output's actual key range lies within its partner's
    val names = Option(new java.io.File(out).listFiles()).get.map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) === 2)
    assert(names.count(_.endsWith("-CompressionInfo.db")) === 2)
    val outMeta = LeveledCompaction.metadata(out).sortBy(_.firstKey)
    assert(outMeta.size === 2)
    // round 14: outputs are STAMPED level 1 in their own Statistics.db —
    // the very field the next round's selection() reads; an output left
    // at L0 would be re-selected as a fresh flush by its own strategy
    assert(outMeta.forall(_.level === 1))
    // boundary property of the re-partition: everything at or below the
    // first partner's last key lands in output 0, the rest in output 1
    // (an L0 key whose EVERY event flushed can sit just outside the
    // partner's own observed range, so containment is one-sided)
    assert(outMeta.head.lastKey <= partners.head.lastKey)
    assert(outMeta.last.firstKey > partners.head.lastKey)
    assert(outMeta.head.lastKey < outMeta.last.firstKey)
    // round 14: the purge guard is decided from SIDECAR METADATA — the
    // leveled layout PROVES it empty (every passthrough range disjoint
    // from every participant's), so the production path runs no guard
    // join at all (the round-13 form shuffled the passthrough keys to
    // learn what these O(#files) range checks already knew)
    val guards = graft.ops.PurgeGuard.load(inPath,
      id => if (participatingIds.contains(id)) 0
            else graft.ops.PurgeGuard.Passthrough)
    assert(graft.ops.PurgeGuard.provablyEmpty(guards))
  }

  test("STCS re-ingestion (q186): the compacted state re-tiers off its " +
      "own real files and exposes the cascade — the small merge is " +
      "selected again beside the passthrough, the big one is stable " +
      "(round 14)") {
    import graft.ops.MinorCompaction
    val rows = MinorCompaction.reingestTable(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // survivors: the passthrough + one output per previously-selected
    // tier, every unit re-tiered from its own written bytes
    assert(rows.map(_._1).toSet ===
      Set("sst-3", "sst-901", "sst-903"))
    val byId = rows.map(r => r._1 -> r).toMap
    // the cascade: the three-small-sstables merge landed in the
    // passthrough's size class — two members, selected again (the NEXT
    // minor compaction, named off the outputs' own files)
    assert(byId("sst-3")._3 === byId("sst-901")._3)
    assert(byId("sst-3")._4 && byId("sst-901")._4)
    // the two-large merge sits alone in a higher class — stable
    assert(byId("sst-903")._3 > byId("sst-3")._3)
    assert(!byId("sst-903")._4)
  }

  test("purge-guard plan: the big-side scan never exchanges — metadata " +
      "prefilter, then broadcast joins only (round 14)") {
    import graft.ops.{MinorCompaction, PurgeGuard}
    val inPath = CassandraDataFixture.ensureTieredFiles(spark, Sf0001)
    val tiers = MinorCompaction.tierTable(spark, Sf0001)
    val groupOf = tiers.filter(_._3).map(t => (t._1, t._2)).toMap
    val guards = PurgeGuard.load(inPath,
      id => groupOf.getOrElse(id, PurgeGuard.Passthrough))
    def cellsOf(p: String) = DataDb.cells(spark, p,
        format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    val ev = cellsOf(inPath)
    import spark.implicits._
    val tierDf = tiers.filter(_._3).map(t => (t._1, t._2))
      .toDF("sstable_id", "tier")
    val winners = ev.join(broadcast(tierDf), "sstable_id")
      .groupBy("tier", "key", "clustering", "column_name")
      .agg(max(struct(col("timestamp_us"), col("sstable_id"),
        col("size_bytes"), col("is_tombstone"),
        col("local_deletion_time_s"), col("ttl_s"), col("is_expiring"),
        col("kind"))).as("w"))
    val blocked = PurgeGuard.blockedKeys(spark, guards, ev, winners,
      col("tier"), graft.sources.Fixtures.GcBeforeS)
    val plan = blocked.queryExecution.executedPlan.toString
    // the confirm join builds on the broadcast CANDIDATE side; the event
    // scan streams through it — no sort-merge join, no hash exchange of
    // the event relation's key column (the round-13 passthrough-key
    // shuffle). The only exchanges left are over the candidate-sized
    // distinct sets.
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("hashpartitioning(ev_key"), plan)
    // and the relation is non-empty here (the guard genuinely bites on
    // the tiered fixture), so the plan shape is not vacuous
    assert(blocked.count() > 0)
  }

  test("leveled re-ingestion (q175): round-1 outputs classify as L1 " +
      "from their OWN Statistics.db and partner the fresh L0 flushes; " +
      "round 2 merges and re-partitions on the round-1 boundaries " +
      "(round 14)") {
    import graft.ops.LeveledCompaction
    val in2 = LeveledCompaction.ensureSecondRoundInput(spark, Sf0001)
    val meta2 = LeveledCompaction.metadata(in2)
    // the assembled second-round set: 2 fresh L0 flushes, and at L1 the
    // 2 round-1 outputs (gens > OutGenBase, stamped by the SINK) plus
    // the 2 untouched passthrough originals
    assert(meta2.count(_.level == 0) === 2)
    assert(meta2.count(_.level == 1) === 4)
    assert(meta2.count(m => m.level == 1 &&
      m.gen > LeveledCompaction.OutGenBase) === 2)
    val (l0, partners, pass) = LeveledCompaction.selection(in2)
    // the new L0 span selects EXACTLY the round-1 outputs as partners —
    // possible only because their own stats say level=1
    assert(l0.map(_.sstableId).toSet === Set("sst-6", "sst-7"))
    assert(partners.map(_.gen).forall(_ > LeveledCompaction.OutGenBase))
    assert(pass.map(_.sstableId).toSet === Set("sst-2", "sst-5"))
    // the q175 relation: 2 compacted units + 2 passthrough units, and
    // round-2 winners at the shifted timestamps beat the round-1 rows
    val rt = LeveledCompaction.roundtrip2(spark, Sf0001)
    val rows = rt.collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("L1-new2-0", "L1-new2-1", "sst-2", "sst-5"))
    // purge stays unconditional in round 2 (disjointness again) and the
    // fresh droppable tombstones are gone from the written outputs
    val out2 = LeveledCompaction.ensureSecondCompacted(spark, Sf0001)
    val gc = graft.sources.Fixtures.GcBeforeS
    assert(DataDb.cells(spark, out2, format = DataDbScan.FormatCassandra)
      .where(col("is_tombstone") &&
        col("local_deletion_time_s") < gc).count() === 0)
    // round-2 outputs are themselves stamped L1 — the cycle closes
    assert(LeveledCompaction.metadata(out2).forall(_.level === 1))
  }

  test("token-range anti-entropy (q176/q177): ring binning spreads, " +
      "differing leaves carry their stream bounds, and the incremental " +
      "digest PRUNES repaired files at planning time (round 14)") {
    import graft.ops.{AntiEntropy, Repair}
    // ranges-to-stream: every emitted leaf has consistent 2^54 bounds
    // and a genuine digest difference; the ring spreads past one leaf
    val ranges = AntiEntropy.rangesToStream(spark, Sf0001).collect()
    assert(ranges.nonEmpty)
    assert(ranges.map(_.getLong(0)).distinct.length > 1,
      "token binning must spread across leaves")
    ranges.foreach { r =>
      val leaf = r.getLong(0)
      assert(r.getLong(1) === leaf * AntiEntropy.TokenLeafSpan)
      assert(r.getLong(2) ===
        leaf * AntiEntropy.TokenLeafSpan + AntiEntropy.TokenLeafSpan - 1)
      assert(Option(r.get(5)) !== Option(r.get(6)),
        s"leaf $leaf emitted without a digest difference")
    }
    // incremental: the partial marking leaves exactly gens 4-6
    // unrepaired, and the scan PLANS only those files (sstable_id
    // pushdown — the repaired half is never opened)
    val partial = Repair.ensureRepairedPartial(spark, Sf0001)
    assert(AntiEntropy.unrepairedGens(partial) === Seq(4L, 5L, 6L))
    val pruned = AntiEntropy.incrementalDigest(spark, partial)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("In(sstable_id"), "sstable_id filter not pushed")
    assert(pruned.rdd.getNumPartitions === 3,
      "repaired files must be pruned at planning time")
    // a fully repaired set digests NOTHING: no unrepaired gens, no scan
    val full = Repair.ensureRepaired(spark, Sf0001)
    assert(AntiEntropy.unrepairedGens(full).isEmpty)
    assert(AntiEntropy.incrementalDigest(spark, full).count() === 0L)
    // and the q177 relation's full row is all-zero while base > partial
    val rows = AntiEntropy.incrementalRoundtrip(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows("full") === ((0L, 0L, 0L)))
    assert(rows("base")._1 > rows("partial")._1)
    assert(rows("partial")._1 > 0L)
  }

  test("multi-level LCS (q183): the promotion chain seeds L2, retains " +
      "tombstones at R2 via the cross-LEVEL guard, and purges them at " +
      "the bottom-level merge (round 14)") {
    import graft.ops.LeveledPromotion
    val chain = LeveledPromotion.ensureChain(spark, Sf0001)
    val finalDir = chain.finalDir
    val meta = graft.ops.LeveledCompaction.metadata(finalDir)
      .sortBy(_.sstableId)
    // final layout: 3 L1 survivors (round-1 outputs + sst-5) and the
    // 2 P2 outputs at LEVEL 2, all read from their own Statistics.db
    assert(meta.count(_.level == 1) === 3)
    assert(meta.count(_.level == 2) === 2)
    val l2 = meta.filter(_.level == 2).sortBy(_.firstKey)
    assert(l2.head.lastKey < l2.last.firstKey, "L2 ranges must tile")
    // the lifecycle, pinned on the intermediate REAL files: R2's L1
    // output retains droppable tombstones (the L2 halves below hold its
    // keys — the guard's confirm path fired), P2's outputs hold none
    val gc = graft.sources.Fixtures.GcBeforeS
    def droppable(p: String, idFilter: org.apache.spark.sql.Column) =
      DataDb.cells(spark, p, format = DataDbScan.FormatCassandra)
        .withColumn("sstable_id", concat(lit("sst-"),
          (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
            .cast("long") - 1L).cast("string")))
        .where(idFilter)
        .where(col("is_tombstone") &&
          col("local_deletion_time_s") < gc).count()
    // R2's REAL intermediate file retained its droppable tombstones —
    // the L1 sstable rode them down because the L2 halves below hold
    // every key (a wrongly-purging R2 leaves the FINAL state identical,
    // which is exactly why this must be pinned on the intermediate)
    assert(droppable(chain.r2Out, lit(true)) > 0L)
    // the P1 halves purged theirs (nothing outside overlapped sst-2)
    assert(droppable(chain.p1Out, lit(true)) === 0L)
    // ...and the bottom-level merge purged the ridden ones
    assert(droppable(finalDir, col("sstable_id")
      .isin("sst-980", "sst-981")) === 0L)
    // the q183 relation agrees, and the flush's tombstones genuinely
    // existed to purge: sst-5 (untouched) still carries droppable ones
    val rows = LeveledPromotion.roundtrip(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("sst-5", "sst-910", "sst-911", "sst-980", "sst-981"))
    val byId = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(9))).toMap
    assert(byId("sst-980")._1 === 2L && byId("sst-981")._1 === 2L)
    assert(byId("sst-980")._2 === 0L && byId("sst-981")._2 === 0L)
    assert(byId("sst-5")._2 > 0L)
  }

  test("executed repair (q182): diverged replicas converge after the " +
      "differing token ranges stream as real sstables both ways " +
      "(round 14)") {
    import graft.ops.RepairStream
    val (pathA, pathB, intoA, intoB) =
      RepairStream.ensureStreamed(spark, Sf0001)
    // the streamed-in files are complete real sstable families
    for (p <- Seq(intoA, intoB)) {
      val names = Option(new java.io.File(p).listFiles()).get.map(_.getName)
      assert(names.count(_.endsWith("-Data.db")) === 1)
      assert(names.exists(_.endsWith("-Statistics.db")))
      assert(names.exists(_.endsWith("-Filter.db")))
    }
    // pre-repair: the replicas genuinely diverge; post-repair: the
    // differing-leaf list over (replica + streamed) is EMPTY both ways
    assert(RepairStream.differingLeaves(spark, pathA, pathB).nonEmpty)
    val rt = graft.ops.RepairStream.roundtrip(spark, Sf0001).collect()
    assert(rt.nonEmpty)
    assert(rt.exists(_.getBoolean(3)), "some leaf must differ pre-repair")
    assert(rt.forall(r => r.getBoolean(5) && r.getBoolean(6)),
      "every leaf must converge on both replicas post-repair")
    // the relation's pre-repair counts are the real files' counts
    def n(p: String) = DataDb.cells(spark, p,
      format = DataDbScan.FormatCassandra).count()
    assert(n(pathA) === rt.map(_.getLong(1)).sum)
    assert(n(pathB) === rt.map(_.getLong(2)).sum)
    assert(n(pathA) > 0 && n(pathB) > 0)
  }

  test("repair mark cycle (q184): the converged replica's stamps are " +
      "byte-exact and the next incremental digest reads NOTHING " +
      "(round 14)") {
    import graft.ops.{AntiEntropy, RepairStream}
    val (conv, marked) = RepairStream.ensureCycle(spark, Sf0001)
    // before: everything unrepaired (streamed-in sstable included);
    // after: nothing — and the marked rewrite is metadata-only
    assert(AntiEntropy.unrepairedGens(conv).size ===
      Option(new java.io.File(conv).listFiles((_, n) =>
        n.endsWith("-Data.db"))).map(_.length).getOrElse(0))
    assert(AntiEntropy.unrepairedGens(marked).isEmpty)
    assert(AntiEntropy.incrementalDigest(spark, marked).count() === 0L)
    assert(AntiEntropy.incrementalDigest(spark, conv).count() > 0L)
    val files = Option(new java.io.File(conv).listFiles()).get
      .filter(_.isFile).filterNot(_.getName.endsWith(
        graft.sources.statsdb.CassandraStatsFormat.Suffix))
    assert(files.nonEmpty)
    files.foreach { f =>
      val m = new java.io.File(marked, f.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.file.Files.readAllBytes(m.toPath)),
        s"${f.getName} must be byte-identical")
    }
  }

  test("level reset (q180) is metadata-only: every non-Statistics file " +
      "byte-identical to the leveled set; stats differ ONLY in level " +
      "(round 14)") {
    import graft.sources.statsdb.CassandraStatsFormat
    val base = CassandraDataFixture.ensureLeveledFiles(spark, Sf0001)
    val reset = graft.ops.LevelReset.ensureReset(spark, Sf0001)
    val files = Option(new java.io.File(base).listFiles()).get
      .filter(_.isFile).sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val m = new java.io.File(reset, f.getName)
      assert(m.exists(), s"missing ${f.getName} in reset set")
      val a = java.nio.file.Files.readAllBytes(f.toPath)
      val b = java.nio.file.Files.readAllBytes(m.toPath)
      if (!f.getName.endsWith(CassandraStatsFormat.Suffix))
        assert(java.util.Arrays.equals(a, b),
          s"${f.getName} must be byte-identical")
      else {
        val pa = CassandraStatsFormat.parse(a)
        assert(CassandraStatsFormat.parse(b).stats.level === 0)
        val bos = new java.io.ByteArrayOutputStream()
        CassandraStatsFormat.write(new java.io.DataOutputStream(bos),
          pa.copy(stats = pa.stats.copy(level = 0)),
          Some(CassandraStatsFormat.componentBytes(a,
            CassandraStatsFormat.TypeHeader)))
        assert(java.util.Arrays.equals(bos.toByteArray, b),
          s"${f.getName}: more than level changed")
      }
    }
  }

  test("sstablesplit (q179): the victim's events land in 4 real " +
      "sstables, partitions intact, consecutive key ranges, no merge " +
      "or purge (round 14)") {
    import graft.ops.SstableSplit
    val inPath = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = false)
    val (vid, _) = SstableSplit.victim(spark, Sf0001)
    val (outPath, vid2) = SstableSplit.ensureSplit(spark, Sf0001)
    assert(vid === vid2)
    def cellsOf(p: String) = DataDb.cells(spark, p,
      format = DataDbScan.FormatCassandra)
    val victimEv = cellsOf(inPath)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
      .where(col("sstable_id") === vid)
    val outEv = cellsOf(outPath)
    // no merge, no purge: the shard union is the victim's event
    // multiset, field for field (ids differ by construction)
    val cols = Seq("key", "clustering", "column_name", "kind",
      "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
      "is_expiring", "size_bytes").map(col)
    assert(outEv.select(cols: _*).orderBy(cols: _*).collect().toSeq ===
      victimEv.select(cols: _*).orderBy(cols: _*).collect().toSeq)
    // partitions intact: every key lives in exactly one shard
    assert(outEv.groupBy("key")
      .agg(countDistinct("sstable_id").as("n"))
      .where(col("n") > 1).count() === 0)
    // 4 physical families whose actual key ranges tile in order
    val names = Option(new java.io.File(outPath).listFiles()).get
      .map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) ===
      SstableSplit.Shards.toInt)
    val bounds = graft.ops.LeveledCompaction.metadata(outPath)
      .sortBy(_.firstKey)
    bounds.sliding(2).foreach {
      case Seq(a, b) => assert(a.lastKey < b.firstKey)
      case _ => ()
    }
  }

  test("sstablesplit shard assignment: the two-level bucketed prefix " +
      "sum equals the plain running window and plans NO unpartitioned " +
      "window (round 15 — the victim's partition list never serializes " +
      "onto one task)") {
    import graft.ops.SstableSplit
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // synthetic per-partition sizes: irregular keys and volumes; tiny
    // buckets force real multi-bucket bases
    val perPart = (1 to 500).map(i =>
      (i.toLong * 7 % 1009, (i % 13 + 1).toLong * 32))
      .distinct.toDF("key", "pb")
    val total = perPart.agg(sum("pb")).head.getLong(0)
    val got = SstableSplit.shardAssignment(perPart, total, buckets = 8)
    // ground truth: the single-window running sum (the shape the engine
    // avoids because one victim = one sorted reducer)
    val one = Window.orderBy("key")
      .rowsBetween(Window.unboundedPreceding, -1)
    val truth = perPart
      .withColumn("before", coalesce(sum("pb").over(one), lit(0L)))
      .select(col("key"),
        least(expr(s"(before * ${SstableSplit.Shards}) div $total"),
          lit(SstableSplit.Shards - 1L)).as("shard"))
    assert(got.orderBy("key").collect().toSeq ===
      truth.orderBy("key").collect().toSeq)
    // every Window node in the plan is PARTITIONED (the old form's
    // pmod(key,1) constant spec moved all rows to one task); the
    // logical plan is inspected because AQE hides the physical tree —
    // and the LAZY plan is inspected because the eager wrapper returns
    // a collected local relation (round 16: the cache no longer pins)
    val lazyPlan = SstableSplit
      .shardAssignmentPlan(perPart, total, buckets = 8)
    val winNodes = lazyPlan.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(winNodes.nonEmpty)
    assert(winNodes.forall(_.partitionSpec.nonEmpty),
      "found an unpartitioned window in the shard-assignment plan")
    assert(!lazyPlan.queryExecution.optimizedPlan.toString.contains("pmod"),
      "the single-reducer pmod partition spec is back")
    // and the eager wrapper leaves nothing NEW pinned in executor
    // storage (other suites' plan caches may legitimately persist)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    SstableSplit.shardAssignment(perPart, total, buckets = 8).collect()
    val pinnedAfter = spark.sparkContext.getPersistentRDDs.keySet
    assert((pinnedAfter -- pinnedBefore).isEmpty,
      "shardAssignment left a cached relation pinned")
  }

  test("sstablesplit shard assignment property: two-level ≡ plain " +
      "window across bucket counts and key-domain shapes (round 15)") {
    import graft.ops.SstableSplit
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "dense" -> (0L until 300L).map(k => (k, (k % 17 + 1) * 8)),
      "sparse" -> (1 to 200).map(i =>
        (i.toLong * 1000000007L + rnd.nextInt(1000),
          rnd.nextInt(5000).toLong + 1)),
      "clustered" -> ((0 to 120).map(i => (i.toLong, 64L)) ++
        (0 to 120).map(i => (900000L + i, 32L))),
      "two-keys" -> Seq((5L, 100L), (6L, 900L)))
    for ((name, data) <- shapes;
        buckets <- Seq(1, 3, 64, data.size * 2)) {
      val perPart = data.distinctBy(_._1).toDF("key", "pb")
      val total = perPart.agg(sum("pb")).head.getLong(0)
      val got = SstableSplit
        .shardAssignment(perPart, total, buckets = buckets)
        .orderBy("key").collect().toSeq
      val one = Window.orderBy("key")
        .rowsBetween(Window.unboundedPreceding, -1)
      val truth = perPart
        .withColumn("before", coalesce(sum("pb").over(one), lit(0L)))
        .select(col("key"),
          least(expr(s"(before * ${SstableSplit.Shards}) div $total"),
            lit(SstableSplit.Shards - 1L)).as("shard"))
        .orderBy("key").collect().toSeq
      assert(got === truth, s"shape=$name buckets=$buckets")
    }
  }

  test("expired blockers (q178): fully-expired candidacy read from real " +
      "Statistics.db, blockers decided by range overlap + older min " +
      "timestamp, all O(#files) metadata (round 14)") {
    import graft.ops.ExpiredBlockers
    val path = CassandraDataFixture.ensureTwcsFiles(spark, Sf0001)
    val metas = ExpiredBlockers.metadata(path)
    val gc = graft.sources.Fixtures.GcBeforeS
    val expired = metas.filter(_.maxLdtS < gc)
    val live = metas.filterNot(_.maxLdtS < gc)
    // both expired bands materialize and the live set carries the
    // sentinel (live cells push maxLocalDeletionTime to Int.MaxValue)
    assert(expired.map(_.sstableId).toSet === Set("sst-4", "sst-5"))
    assert(live.nonEmpty)
    assert(live.forall(_.maxLdtS === Int.MaxValue.toLong))
    // the written bytes agree with the claim: every event in an expired
    // sstable is a droppable tombstone
    val ev = DataDb.cells(spark, path, format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    assert(ev.where(col("sstable_id").isin("sst-4", "sst-5") &&
      !(col("is_tombstone") && col("local_deletion_time_s") < gc))
      .count() === 0)
    // the relation: the OLD expired band has strictly fewer blockers
    // than the new one (live bands newer than its max timestamp cannot
    // block), and every pair satisfies the rule on the sidecar numbers
    val rows = ExpiredBlockers.blockers(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byBlocked = rows.groupBy(_.getString(0))
    assert(byBlocked.keySet === Set("sst-4", "sst-5"))
    assert(byBlocked("sst-4").length < byBlocked("sst-5").length)
    val metaOf = metas.map(m => m.sstableId -> m).toMap
    rows.foreach { r =>
      val c = metaOf(r.getString(0)); val b = metaOf(r.getString(3))
      // Cassandra's drop rule requires every overlapping sstable's min
      // timestamp STRICTLY newer than the candidate's max — an equal
      // timestamp still blocks (round 15, ADVICE fix)
      assert(b.minTsUs <= c.maxTsUs)
      assert(b.firstKey <= c.lastKey && b.lastKey >= c.firstKey)
      assert(c.maxLdtS < gc && b.maxLdtS >= gc)
    }
  }

  test("purge-guard stage-1 Expression: codegen form bit-equal to the " +
      "driver-side function (the former UDF body) over range boundaries " +
      "and bloom misses, evaluated inside codegen (round 15)") {
    import graft.ops.{MinorCompaction, PurgeGuard}
    import spark.implicits._
    val inPath = graft.sources.datadb.CassandraDataFixture
      .ensureTieredFiles(spark, Sf0001)
    val groupOf = MinorCompaction.tierTable(spark, Sf0001)
      .filter(_._3).map { case (id, t, _) => (id, t) }.toMap
    val metas = PurgeGuard.load(inPath,
      id => groupOf.getOrElse(id, PurgeGuard.Passthrough))
    val arr = metas.toArray
    val bc = spark.sparkContext.broadcast(arr)
    // probe grid: every sstable's range boundaries +/-1 (range-arm
    // edges), keys known present, and far-out keys (bloom/range misses),
    // against every group id in play (incl. one with no participants)
    val keys = metas.flatMap(m => Seq(m.firstKey - 1, m.firstKey,
      m.firstKey + 1, m.lastKey - 1, m.lastKey, m.lastKey + 1)) ++
      Seq(Long.MinValue / 2, -1L, 0L, Long.MaxValue / 2)
    val groups = (metas.map(_.group) :+ PurgeGuard.Passthrough :+ 99)
      .distinct
    val probes = for { g <- groups; k <- keys } yield (g, k)
    val df = probes.toDF("grp", "key")
    val got = df.withColumn("r", graft.functions.GuardMayContain.column(
        col("grp"), col("key"), bc))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getBoolean(2)))
      .toMap
    probes.foreach { case (g, k) =>
      assert(got((g, k)) === PurgeGuard.mayContainOutside(arr, g, k),
        s"expression diverges from driver function at (grp=$g, key=$k)")
    }
    // both arms exercised
    assert(got.values.exists(identity) && got.values.exists(!_))
    // the filter stays inside whole-stage codegen: no BatchEvalUDF /
    // interpreted-eval fallback markers in the executed plan (the local
    // checkpoint hides the LocalRelation so the optimizer cannot fold
    // the filter at plan time and a real Filter node survives)
    val filtered = df.localCheckpoint()
      .where(graft.functions.GuardMayContain.column(
        col("grp"), col("key"), bc))
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("guard_may_contain"))
    assert(!plan.toLowerCase.contains("scalaudf"))
  }

  test("purge-guard provablyEmpty is per-COMPACTION in multi-group " +
      "(STCS) semantics: a sibling selected tier's overlapping range " +
      "defeats the proof even with zero passthrough sstables (round 15)") {
    import graft.ops.PurgeGuard
    import graft.ops.PurgeGuard.SstGuard
    val f = graft.sources.filterdb.FilterDbFormat.Filter(1, Array(0L))
    def g(id: String, grp: Int, lo: Long, hi: Long) =
      SstGuard(id, grp, lo, hi, f)
    // two selected tiers, ranges overlap: tier 1's winners may have keys
    // living in tier 2's files — the guard is NOT provably empty
    assert(!PurgeGuard.provablyEmpty(Seq(
      g("sst-0", 1, 0, 100), g("sst-1", 1, 50, 150),
      g("sst-2", 2, 80, 200), g("sst-3", 2, 120, 300))))
    // the same two tiers range-disjoint: provably empty
    assert(PurgeGuard.provablyEmpty(Seq(
      g("sst-0", 1, 0, 100), g("sst-1", 1, 50, 100),
      g("sst-2", 2, 101, 200), g("sst-3", 2, 150, 300))))
    // passthrough overlap still defeats it (the original single-group
    // rule is the grp-count==1 special case of the pairwise check)
    assert(!PurgeGuard.provablyEmpty(Seq(
      g("sst-0", 1, 0, 100),
      g("sst-1", PurgeGuard.Passthrough, 90, 200))))
  }

  test("executed TWCS (q188): window assignment from sidecars, the " +
      "UNBLOCKED fully-expired sstable drops whole, the BLOCKED one " +
      "survives, only the ≥2-member window merges and never across " +
      "windows (round 15)") {
    import graft.ops.{ExpiredBlockers, TwcsCompaction}
    val inPath = CassandraDataFixture.ensureTwcsExecFiles(spark, Sf0001)
    val gc = graft.sources.Fixtures.GcBeforeS
    val p = TwcsCompaction.plan(inPath, gc)
    // both expiry branches materialize: sst-4 unblocked -> dropped,
    // sst-5 blocked -> survives
    assert(p.dropped === Seq("sst-4"))
    assert(p.blocked === Seq("sst-5"))
    // the drop decision's evidence, from the sidecars alone: sst-4's
    // max timestamp is STRICTLY older than every live file's min (no
    // blocker can exist); sst-5 overlaps an older-or-equal live min
    val metas = ExpiredBlockers.metadata(inPath)
    val live = metas.filter(_.maxLdtS >= gc)
    val s4 = metas.find(_.sstableId == "sst-4").get
    val s5 = metas.find(_.sstableId == "sst-5").get
    assert(live.nonEmpty && live.forall(_.minTsUs > s4.maxTsUs))
    assert(live.exists(b => b.firstKey <= s5.lastKey &&
      b.lastKey >= s5.firstKey && b.minTsUs <= s5.maxTsUs))
    // exactly one ≥2-member window — the NEWEST — merges; older
    // windows are singletons and never re-compact (the TWCS guarantee)
    assert(p.mergedWindows.map(_._1).size === 1)
    val (mergeWin, mergeIds) = p.mergedWindows.head
    assert(mergeIds === Seq("sst-2", "sst-3"))
    assert(p.singles === Seq("sst-0", "sst-1"))
    val liveWins = live.map(m => p.windowOf(m.sstableId))
    assert(mergeWin === liveWins.max)
    // executed: ONE real compressed family holds the merged window
    val outPath = TwcsCompaction.ensureCompacted(spark, Sf0001)
    val names = Option(new java.io.File(outPath).listFiles()).get
      .map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) === 1)
    assert(names.count(_.endsWith("-CompressionInfo.db")) === 1)
    // the merged output is the LWW winners of EXACTLY the two window
    // members — no cross-window or expired-file event leaks in
    def cellsOf(pth: String) = DataDb.cells(spark, pth,
        format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    import org.apache.spark.sql.expressions.Window
    val members = cellsOf(inPath)
      .where(col("sstable_id").isin(mergeIds: _*))
    val expected = members
      .withColumn("rn", row_number().over(
        Window.partitionBy("key", "clustering", "column_name")
          .orderBy(col("timestamp_us").desc, col("sstable_id").desc,
            col("size_bytes").desc, col("is_tombstone").desc,
            col("local_deletion_time_s").desc, col("ttl_s").desc,
            col("is_expiring").desc, col("kind").desc)))
      .where(col("rn") === 1)
    val cols = Seq("key", "clustering", "column_name", "kind",
      "timestamp_us", "ttl_s", "local_deletion_time_s", "is_tombstone",
      "is_expiring", "size_bytes").map(col)
    assert(cellsOf(outPath).select(cols: _*).orderBy(cols: _*)
      .collect().toSeq ===
      expected.select(cols: _*).orderBy(cols: _*).collect().toSeq)
    // the relation tells the whole story, one action per branch
    val rows = TwcsCompaction.roundtrip(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq("sst-0" -> "passthrough", "sst-1" -> "passthrough",
      "sst-4" -> "dropped", "sst-5" -> "blocked",
      s"window-$mergeWin" -> "compacted"))
  }

  test("executed TWCS at a long grace (gcBefore=0): nothing expires, " +
      "the former candidates re-enter window bucketing, and TWO " +
      "windows merge — the multi-window path (round 15)") {
    import graft.ops.TwcsCompaction
    val inPath = CassandraDataFixture.ensureTwcsExecFiles(spark, Sf0001)
    val p = TwcsCompaction.plan(inPath, gcBeforeS = 0L)
    // no candidacy at an infinite-grace cutoff: tombstones must keep
    // shadowing, nothing drops prematurely
    assert(p.dropped.isEmpty && p.blocked.isEmpty)
    // the former expired files are ordinary window members now: sst-5
    // (max write-day < 2500 -> window 3) joins sst-0's window, so TWO
    // windows reach the merge threshold
    assert(p.mergedWindows.map { case (w, ids) => (w, ids) }.toMap ===
      Map(3L -> Seq("sst-0", "sst-5"), 5L -> Seq("sst-2", "sst-3")))
    assert(p.singles === Seq("sst-1", "sst-4"))
    // executed: one real family PER merged window, and the w3 output
    // keeps sst-5's tombstones (none droppable at this cutoff)
    val outPath = TwcsCompaction.ensureCompacted(spark, Sf0001,
      gcBeforeS = 0L)
    val names = Option(new java.io.File(outPath).listFiles()).get
      .map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) === 2)
    val outEv = DataDb.cells(spark, outPath,
        format = DataDbScan.FormatCassandra)
      .withColumn("gen", regexp_extract(col("sstable_id"),
        "nb-(\\d+)-big", 1).cast("long") - 1L)
    val w3 = outEv.where(col("gen") === TwcsCompaction.OutGenBase + 3L)
    assert(w3.where(col("is_tombstone")).count() > 0L,
      "the long-grace merge must retain the shadowing tombstones")
    // and the relation at this cutoff names only compact/passthrough
    val actions = TwcsCompaction.whatIf(spark, Sf0001, gcBeforeS = 0L)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(actions === Map(
      "sst-0" -> "compact", "sst-1" -> "passthrough",
      "sst-2" -> "compact", "sst-3" -> "compact",
      "sst-4" -> "passthrough", "sst-5" -> "compact"))
  }

  test("TWCS what-if + re-ingestion (q190/q191): the decision table " +
      "names every branch before execution, and the compacted state " +
      "re-enters it STABLE — single-member windows, dropped file gone, " +
      "blocked candidate still blocked (round 15)") {
    import graft.ops.TwcsCompaction
    val pre = TwcsCompaction.whatIf(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getString(4)))
      .toMap
    // the what-if names exactly the q188 branches, with the blocker
    // counts justifying each expiry verdict
    assert(pre("sst-4")._4 === "drop" && pre("sst-4")._3 === 0L)
    assert(pre("sst-5")._4 === "blocked" && pre("sst-5")._3 >= 1L)
    assert(pre("sst-2")._4 === "compact" && pre("sst-3")._4 === "compact")
    assert(pre("sst-0")._4 === "passthrough" &&
      pre("sst-1")._4 === "passthrough")
    // re-ingestion: the post state is TWCS's steady state
    val post = TwcsCompaction.reingestTable(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(!post.contains("sst-4"), "dropped file resurfaced")
    assert(!post.contains("sst-2") && !post.contains("sst-3"),
      "merged members survived as themselves")
    // nothing left to compact: every live window holds one sstable
    assert(post.values.forall(_._4 != "compact"))
    assert(post.count(_._2._4 == "passthrough") === 3) // sst-0/1 + merged
    // the blocked candidate is STILL blocked (older live data remains)
    assert(post("sst-5")._4 === "blocked" && post("sst-5")._3 >= 1L)
    // the merged output keeps its window (max timestamp unchanged)
    val mergedId = post.keys.find(_.stripPrefix("sst-")
      .toLongOption.exists(_ >= TwcsCompaction.OutGenBase)).get
    assert(post(mergedId)._1 === pre("sst-2")._1)
  }

  test("matrix repair (q189): per-leaf MINIMAL streaming — every " +
      "stream targets the one replica missing the leaf, sourced from " +
      "the lowest-indexed complete replica; all three replicas " +
      "converge on the union (round 15)") {
    import graft.ops.RepairMatrix
    val s = RepairMatrix.ensureSession(spark, Sf0001)
    assert(s.srcFor.nonEmpty)
    def dg(m: Map[Long, (Long, Long)], leaf: Long): Option[Long] =
      m.get(leaf).map(_._2)
    for (((leaf, t), src) <- s.srcFor) {
      // the target genuinely differs from the union on this leaf...
      assert(dg(s.pre(t), leaf) != dg(s.uni, leaf))
      // ...the source is another replica that matches it exactly...
      assert(src != t)
      assert(dg(s.pre(src), leaf) === dg(s.uni, leaf))
      // ...and is the LOWEST-indexed such replica
      (0 until src).filter(_ != t).foreach(r =>
        assert(dg(s.pre(r), leaf) != dg(s.uni, leaf)))
      // leaf-correlated divergence: the needy replica is leaf % 3
      assert(t === (leaf % 3).toInt)
    }
    // NO stream to a replica already holding a leaf: srcFor contains
    // only differing (leaf, target) pairs — every matching pair absent
    for (leaf <- s.uni.keys; t <- 0 until RepairMatrix.Replicas
        if dg(s.pre(t), leaf) == dg(s.uni, leaf))
      assert(!s.srcFor.contains((leaf, t)),
        s"leaf $leaf streamed to replica $t which already holds it")
    // executed: each target received at least one real streamed family
    s.intoDirs.foreach { d =>
      val names = Option(new java.io.File(d).list()).map(_.toSeq)
        .getOrElse(Nil)
      assert(names.exists(_.endsWith("-Data.db")))
    }
    // the relation: every replica's post-repair digest equals the
    // union on EVERY leaf
    val rows = RepairMatrix.roundtrip(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(8) && r.getBoolean(9) && r.getBoolean(10),
        s"leaf ${r.getLong(0)} did not converge on all replicas")
    }
  }

  test("matrix mark cycle (q192): all three converged replicas stamp " +
      "repairedAt and the incremental digest reads NOTHING on any of " +
      "them (round 15)") {
    import graft.ops.RepairMatrix
    val rows = RepairMatrix.markCycle(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 6)
    for (r <- 0 until RepairMatrix.Replicas) {
      val (cSst, cUnrep, cEv, cLeaves, _) = rows(s"r$r-converged")
      val (mSst, mUnrep, mEv, mLeaves, mDigest) = rows(s"r$r-marked")
      // converged-but-unmarked: everything is unrepaired and readable
      assert(cUnrep === cSst && cEv > 0L && cLeaves > 0L)
      // marked: same files on disk, zero planned reads
      assert(mSst === cSst)
      assert(mUnrep === 0L && mEv === 0L && mLeaves === 0L &&
        mDigest === 0L)
    }
  }

  test("sstableofflinerelevel (q204): the flat set first-fits into " +
      "non-overlapping runs, the fullest run lands deepest, the " +
      "rewritten sidecars carry the plan, and every level is disjoint " +
      "(round 16)") {
    import graft.ops.OfflineRelevel
    val rows = OfflineRelevel.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    def l(r: org.apache.spark.sql.Row, n: String) =
      r.getLong(r.fieldIndex(n))
    val byId = rows.map(r => r.getString(0) -> r).toMap
    // the overlapping L0 flushes force MULTIPLE runs, and every run is
    // a non-overlapping key chain (the LCS level invariant)
    val runsOf = rows.groupBy(l(_, "run"))
    assert(runsOf.size >= 2)
    runsOf.values.foreach { rs =>
      rs.sortBy(l(_, "first_key")).sliding(2).foreach {
        case Array(a, b) =>
          assert(l(a, "last_key") < l(b, "first_key"),
            s"run ${l(a, "run")} holds overlapping members")
        case _ => ()
      }
    }
    // levels rank runs by volume ascending: the fullest run is deepest
    val volByRun = runsOf.view
      .mapValues(_.map(l(_, "model_bytes")).sum).toMap
    val lvlByRun = rows.map(r => l(r, "run") -> l(r, "lvl")).toMap
    val ordered = volByRun.toSeq.sortBy { case (run, v) => (v, run) }
    ordered.zipWithIndex.foreach { case ((run, _), i) =>
      assert(lvlByRun(run) === i + 1L, s"run $run mis-leveled") }
    rows.foreach { r =>
      assert(l(r, "lvl_reread") === l(r, "lvl"),
        s"${r.getString(0)} rewritten level drifted from the plan")
      assert(l(r, "level_overlaps") === 0L,
        s"${r.getString(0)} violates the level invariant")
    }
    // planning is a pure function: replanning the planned state is a
    // fixed point (runs re-derive identically from the new sidecars)
    val replanned = OfflineRelevel.plan(rows.toSeq.map(r =>
      (r.getString(0), l(r, "first_key"), l(r, "last_key"),
        l(r, "model_bytes"))))
    replanned.foreach(a =>
      assert(a.level.toLong === l(byId(a.sstableId), "lvl")))
  }

  test("sstablescrub (q201): the corrupted partition is skipped, every " +
      "neighbor salvages intact through the real rewrite, and the " +
      "Digest verdict flags exactly the corrupted file (round 16)") {
    import graft.ops.Scrub
    import graft.sources.datadb.{DataDb, DataDbScan}
    val (_, victim) = Scrub.ensureCorrupted(spark, Sf0001)
    assert(victim % Scrub.VictimKeyMod === 0L)
    val rows = Scrub.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val unit = r.getString(r.fieldIndex("unit"))
      val bad = unit == "sst-2"
      assert(r.getBoolean(r.fieldIndex("digest_ok")) === !bad,
        s"$unit digest verdict")
      assert(r.getLong(r.fieldIndex("partitions_skipped")) ===
        (if (bad) 1L else 0L), s"$unit skip count")
      assert(r.getLong(r.fieldIndex("skipped_key")) ===
        (if (bad) victim else -1L), s"$unit skipped key")
      assert(r.getLong(r.fieldIndex("partitions_salvaged")) ===
        r.getLong(r.fieldIndex("partitions_total")) -
          (if (bad) 1L else 0L), s"$unit salvage count")
    }
    // the salvage is the uncorrupted original minus exactly the victim
    // partition, event for event
    val orig = DataDb.cells(spark,
      CassandraDataFixture.ensureFiles(spark, Sf0001, compressed = false),
      format = DataDbScan.FormatCassandra)
    val expectBad = orig
      .where(col("sstable_id") === "nb-3-big" && col("key") =!= victim)
      .count()
    val got = rows.find(r =>
      r.getString(r.fieldIndex("unit")) == "sst-2").get
    assert(got.getLong(got.fieldIndex("events")) === expectBad)
  }

  test("sstableupgrade (q200): the nb -> oa version rewrite carries " +
      "every component, leaves Data.db byte-identical, scans " +
      "event-identical, and fills the oa fields from the sstable's own " +
      "data — nb stats preserved through the version change (round 16)") {
    import graft.ops.SstableUpgrade
    import graft.sources.statsdb.CassandraStatsFormat
    val rows = SstableUpgrade.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      def b(n: String) = r.getBoolean(r.fieldIndex(n))
      def l(n: String) = r.getLong(r.fieldIndex(n))
      assert(b("components_match") && b("data_bytes_equal") &&
        b("coverage_consistent"))
      assert(l("events_nb") === l("events_oa"))
      assert(l("partitions_nb") === l("partitions_oa"))
      assert(l("digest_nb") === l("digest_oa"))
      assert(l("first_key") <= l("last_key"))
      assert(l("min_ts_us") <= l("max_ts_us"))
    }
    // version-stable stats fields survive the re-encode bit-for-bit
    val inPath = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val outPath = SstableUpgrade.ensureUpgraded(spark, Sf0001)
    (1 to 6).foreach { gen =>
      val nb = CassandraStatsFormat.parse(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(inPath, s"nb-$gen-big-Statistics.db")),
        version = "nb").stats
      val oa = CassandraStatsFormat.parse(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(outPath, s"oa-$gen-big-Statistics.db")),
        version = "oa").stats
      assert(oa.minTimestampUs === nb.minTimestampUs)
      assert(oa.maxTimestampUs === nb.maxTimestampUs)
      assert(oa.level === nb.level)
      assert(oa.repairedAtMs === nb.repairedAtMs)
      assert(oa.totalRows === nb.totalRows)
      assert(oa.totalColumnsSet === nb.totalColumnsSet)
      // the covered slice carries exactly the legacy min/max blobs
      val slice = oa.coveredClustering.get
      assert(slice.start.values.map(_.get.toSeq) ===
        nb.minClustering.map(_.toSeq))
      assert(slice.end.values.map(_.get.toSeq) ===
        nb.maxClustering.map(_.toSeq))
    }
  }

  test("primary-range repair (q199): per-owner plans partition the leaf " +
      "set (leaf mod 3) and their union reproduces the full q189 matrix " +
      "coverage (round 16)") {
    import graft.ops.RepairMatrix
    val pr = RepairMatrix.primaryRange(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // partition: every leaf exactly once, owner = leaf mod 3
    assert(pr.map(_._1).distinct.length === pr.length)
    pr.foreach { case (leaf, (owner, _, _, _, _)) =>
      assert(owner === leaf % 3) }
    // a full-cluster -pr repair does 1x the work: owners split the ring
    val byOwner = pr.groupBy(_._2._1).view.mapValues(_.length).toMap
    assert(byOwner.keySet === Set(0L, 1L, 2L))
    assert(byOwner.values.sum === pr.length)
    // union of plans == the q189 full plan's directions, leaf by leaf
    val full = RepairMatrix.roundtrip(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(pr.length === full.size)
    pr.foreach { case (leaf, (_, s0, s1, s2, streams)) =>
      assert((s0, s1, s2) === full(leaf),
        s"leaf $leaf direction mismatch vs the full matrix")
      assert(streams === Seq(s0, s1, s2).count(_ >= 0L).toLong)
    }
    // and the plan is not vacuous: some leaf streams somewhere
    assert(pr.exists(_._2._5 > 0L))
  }

  test("TWCS in-window STCS (q197): window assignment composes with the " +
      "in-window size ladder — the newest window's two small flushes " +
      "compact as ONE tier while the big flush sharing that window " +
      "passes through (round 16)") {
    import graft.ops.TwcsStcsCompaction
    val inPath = CassandraDataFixture.ensureTwcsStcsFiles(spark, Sf0001)
    val p = TwcsStcsCompaction.plan(spark, inPath)
    // window assignment per sstable (max write-day div 640)
    assert(p.windowOf === Map("sst-0" -> 3L, "sst-1" -> 4L,
      "sst-2" -> 5L, "sst-3" -> 5L, "sst-4" -> 5L))
    // the newest window's flushes span TWO size classes: the ~1/6-sized
    // pair shares a tier; the ~4/6 flush sits at least two rungs up
    val small = p.tierOf("sst-2")
    assert(p.tierOf("sst-3") === small)
    assert(p.tierOf("sst-4") >= small + 2)
    // selection: only the qualifying (window, tier) group merges — the
    // big flush NEVER folds into the window merge
    assert(p.merged ===
      Seq(((5L, small), Seq("sst-2", "sst-3"))))
    assert(p.passthrough === Seq("sst-0", "sst-1", "sst-4"))
    val rows = TwcsStcsCompaction.roundtrip(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 4)
    // merged unit: read back from the real file, events = LWW dedup of
    // the two flushes (no droppable winners in the newest window, so
    // nothing purges)
    val ev = graft.sources.datadb.DataDb.cells(spark, inPath,
        format = graft.sources.datadb.DataDbScan.FormatCassandra)
      .withColumn("sid",
        regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L)
    val mergedIn = ev.where(col("sid").isin(2L, 3L))
    val expectMerged = mergedIn
      .select("key", "clustering", "column_name").distinct().count()
    val (mAct, mWin, mTier, mIn, mEvents) = rows(s"win-5-tier-$small")
    assert(mAct === "compacted" && mWin === 5L && mTier === small.toLong
      && mIn === 2L && mEvents === expectMerged)
    // passthrough units re-read their untouched originals
    val (pAct, pWin, pTier, _, pEvents) = rows("sst-4")
    assert(pAct === "passthrough" && pWin === 5L &&
      pTier === p.tierOf("sst-4").toLong &&
      pEvents === ev.where(col("sid") === 4L).count())
  }

  test("UNIFIED compaction (q206): density levels from token-span " +
      "normalization, the tiered/leveled regime split, shard-aligned " +
      "outputs on the real bytes, and both purge-guard branches biting " +
      "(round 16)") {
    import graft.ops.UnifiedCompaction
    val inPath = CassandraDataFixture.ensureUcsFiles(spark, Sf0001)
    val p = UnifiedCompaction.plan(spark, inPath)
    val levelOf = p.metas.map(s => s.id -> s.level).toMap
    // the designed three-class layout: 4 full-ring flushes at level 0,
    // the overlapping eighth pair at level 1, the 3 disjoint dense
    // sstables at level 2
    assert(levelOf === Map(
      "sst-0" -> 0, "sst-1" -> 0, "sst-2" -> 0, "sst-3" -> 0,
      "sst-6" -> 1, "sst-7" -> 1,
      "sst-4" -> 2, "sst-5" -> 2, "sst-8" -> 2))
    // DENSITY, not size: sst-6 holds FEWER bytes than the flush sst-1
    // yet sits a level above it — the inversion size-tiering can never
    // produce, and the reason UCS survives sharding
    val bytesOf = p.metas.map(s => s.id -> s.bytes).toMap
    assert(bytesOf("sst-6") < bytesOf("sst-1"))
    assert(levelOf("sst-6") > levelOf("sst-1"))
    // regimes: level 0 merges as one tiered group; level 1's overlap
    // island merges; level 2's disjoint members are left alone
    assert(p.merged === Seq(
      (0, Seq("sst-0", "sst-1", "sst-2", "sst-3")),
      (1, Seq("sst-6", "sst-7"))))
    assert(p.passthrough === Seq("sst-4", "sst-5", "sst-8"))
    // the leveled invariant on the metas: L2 spans pairwise disjoint,
    // the L1 island genuinely overlapping
    val l2 = p.metas.filter(_.level == 2).sortBy(_.minTok)
    l2.zip(l2.tail).foreach { case (a, b) => assert(a.maxTok < b.minTok) }
    val l1 = p.metas.filter(_.level == 1).sortBy(_.id)
    assert(l1.size === 2)
    assert(l1(0).minTok <= l1(1).maxTok && l1(1).minTok <= l1(0).maxTok)
    // physical outputs: 4 ring-quarter shards for the level-0 merge +
    // 1 for the level-1 island (whose eighth lies inside quarter 2) —
    // sst-(1400+g*4+s) writes as nb-(gen+1)-big
    val outPath = UnifiedCompaction.ensureCompacted(spark, Sf0001)
    val outGens = Option(new java.io.File(outPath)
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(1401L, 1402L, 1403L, 1404L, 1407L))
    // shard alignment on the real bytes: every output row's token
    // quarter equals its file's shard code — no output crosses a fixed
    // shard boundary, so later compactions stay shard-local
    val outEv = DataDb.cells(spark, outPath,
        format = DataDbScan.FormatCassandra)
      .withColumn("code",
        regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L - UnifiedCompaction.OutGenBase)
      .withColumn("shard", col("code") % 4)
      .withColumn("quarter", shiftright(
        graft.ops.AntiEntropy.token(col("key")), 58))
    assert(outEv.where(col("shard") =!= col("quarter")).count() === 0L)
    // both guard branches bite in BOTH groups: some droppable winners
    // retain (an outside sstable holds the key), some purge (none does)
    val ev = DataDb.cells(spark, inPath,
        format = DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    import spark.implicits._
    val memberGroup = p.merged.zipWithIndex.flatMap {
      case ((_, ids), g) => ids.map(id => (id, g))
    }
    val groupDf = memberGroup.toDF("sstable_id", "g")
    val dropWinners = ev.join(broadcast(groupDf), "sstable_id")
      .groupBy("g", "key", "clustering", "column_name")
      .agg(max(struct(col("timestamp_us"), col("sstable_id"),
        col("size_bytes"), col("is_tombstone"),
        col("local_deletion_time_s"), col("ttl_s"),
        col("is_expiring"), col("kind"))).as("w"))
      .where(col("w.is_tombstone") && col("w.local_deletion_time_s") <
        graft.sources.Fixtures.GcBeforeS)
    val outsideKeys = ev.join(broadcast(groupDf), Seq("sstable_id"),
        "left")
      .select(coalesce(col("g"), lit(-1)).as("og"), col("key"))
      .distinct()
    val retained = dropWinners.join(outsideKeys.as("o"),
        dropWinners("key") === col("o.key") &&
          col("o.og") =!= dropWinners("g"), "left_semi")
      .groupBy("g").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val droppable = dropWinners.groupBy("g").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Seq(0, 1).foreach { g =>
      assert(retained(g) > 0L, s"group $g: no retained droppable")
      assert(droppable(g) > retained(g), s"group $g: nothing purged")
    }
    // the written bytes carry exactly the kept winners: merged events
    // per group = LWW winners - purged droppables
    val rows = UnifiedCompaction.roundtrip(spark, Sf0001).collect()
    val mergedEvents = rows.filter(_.getString(1) == "compacted")
      .groupBy(_.getString(0).split("-")(1))
      .view.mapValues(_.map(_.getLong(5)).sum).toMap
    val winnersPerG = ev.join(broadcast(groupDf), "sstable_id")
      .select("g", "key", "clustering", "column_name").distinct()
      .groupBy("g").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Seq(0, 1).foreach { g =>
      val purged = droppable(g) - retained(g)
      assert(mergedEvents(s"$g") === winnersPerG(g) - purged)
    }
  }

  test("UCS re-ingestion (q211): the compacted state re-enters the " +
      "density ladder and is STABLE — shard outputs one level up and " +
      "quarter-disjoint, the island output beside the originals, no " +
      "group selects (round 16)") {
    import graft.ops.UnifiedCompaction
    val statePath = UnifiedCompaction.ensureReingestState(spark, Sf0001)
    val p = UnifiedCompaction.plan(spark, statePath)
    // steady state: NOTHING selects — the bounded-write-amplification
    // guarantee on the strategy's own outputs
    assert(p.merged.isEmpty)
    assert(p.passthrough.size === 8)
    val levelOf = p.metas.map(s => s.id -> s.level).toMap
    // the level-0 merge's quarter shards re-classify ONE level up
    // (same bytes over a quarter of the ring = 4x the density)...
    Seq("sst-1400", "sst-1401", "sst-1402", "sst-1403").foreach(id =>
      assert(levelOf(id) === 1, s"$id level"))
    // ...and the island output joins the dense top level, disjoint
    // from the originals it never overlapped
    assert(levelOf("sst-1406") === 2)
    Seq("sst-4", "sst-5", "sst-8").foreach(id =>
      assert(levelOf(id) === 2, s"$id level"))
    // disjointness within each level of the new state
    Seq(1, 2).foreach { lvl =>
      val members = p.metas.filter(_.level == lvl).sortBy(_.minTok)
      members.zip(members.tail).foreach { case (a, b) =>
        assert(a.maxTok < b.minTok, s"level $lvl overlap: ${a.id}/${b.id}")
      }
    }
    // the relation's action column agrees
    val rows = UnifiedCompaction.reingestTable(spark, Sf0001).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getString(6) === "passthrough"))
  }

  test("sstableloader (q207): ring ownership x RF replication — each " +
      "node receives ONE real streamed sstable holding exactly its " +
      "owned quarters, verified against the corpus digest-by-digest " +
      "(round 16)") {
    import graft.ops.BulkLoad
    val rows = BulkLoad.roundtrip(spark, Sf0001).collect()
    // 4 nodes x RF=2 owned quarters, all verified on the real bytes
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(7)), "a received view diverged")
    // SimpleStrategy ownership: node n holds quarters {n, n-1 mod 4}
    val owned = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0 until 4).foreach { n =>
      assert(owned(n.toLong) === Set(n.toLong, ((n + 3) % 4).toLong))
    }
    // every quarter held by exactly RF nodes
    assert(rows.forall(_.getLong(8) === 2L))
    // the plan's fan-in varies with the q206 spans: full-ring flushes
    // reach every quarter, the dense quarter files only their own —
    // quarter 2 (the eighth pair + sst-8's low edge) has the most
    val fanIn = rows.groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getLong(2)).head).toMap
    assert(fanIn === Map(0L -> 5L, 1L -> 5L, 2L -> 7L, 3L -> 5L))
    // replication IS duplication: the cluster holds RF copies of every
    // event, as one physical file per node
    val corpusEvents = rows.groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getLong(5)).head).toMap.values.sum
    assert(rows.map(_.getLong(3)).sum === 2L * corpusEvents)
    val outPath = BulkLoad.ensureLoaded(spark, Sf0001)
    val outGens = Option(new java.io.File(outPath)
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(1501L, 1502L, 1503L, 1504L))
  }

  test("nodetool cleanup (q212): after the ring doubles each old node " +
      "rewrites away exactly its two foreign eighths — retained views " +
      "partition the ring and digest-match the corpus (round 16)") {
    import graft.ops.Cleanup
    // ownership arithmetic: kept ∪ dropped = the node's old 4 eighths
    (0 until 4).foreach { n =>
      val old = Set((2L * n), (2L * n + 1),
        ((2 * n + 6) % 8).toLong, ((2 * n + 7) % 8).toLong)
      assert(Cleanup.keptEighths(n) ++ Cleanup.droppedEighths(n) === old)
      assert((Cleanup.keptEighths(n) &
        Cleanup.droppedEighths(n)).isEmpty)
    }
    val rows = Cleanup.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 8)
    // every retained view verified on the real cleaned bytes; the
    // views PARTITION the ring (each eighth held by exactly one node)
    assert(rows.forall(_.getBoolean(6)))
    assert(rows.forall(_.getLong(8) === 1L))
    assert(rows.map(_.getLong(1)).toSet === (0L to 7L).toSet)
    // per node: exactly its kept eighths, and the dropped volume is
    // the two foreign eighths' corpus events
    val corpusOf = rows.map(r => r.getLong(1) -> r.getLong(4)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (n, rs) =>
      assert(rs.map(_.getLong(1)).toSet ===
        Cleanup.keptEighths(n.toInt))
      val wantDropped = Cleanup.droppedEighths(n.toInt)
        .toSeq.map(corpusOf).sum
      assert(rs.forall(_.getLong(7) === wantDropped), s"node $n dropped")
      assert(wantDropped > 0L)
    }
    // one real cleaned sstable per node
    val outGens = Option(new java.io.File(
        Cleanup.ensureCleaned(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(1601L, 1602L, 1603L, 1604L))
  }

  test("node bootstrap (q213): each new node streams its two eighths " +
      "from its ring predecessor and the doubled cluster converges to " +
      "a full RF=2 ring on the real bytes (round 16)") {
    import graft.ops.{Bootstrap, Cleanup}
    val rows = Bootstrap.roundtrip(spark, Sf0001).collect()
    // 8 nodes x 2 held eighths, all verified, RF=2 everywhere
    assert(rows.length === 16)
    assert(rows.forall(_.getBoolean(8)))
    assert(rows.forall(_.getLong(9) === 2L))
    // every eighth held by exactly one old and one new node
    rows.groupBy(_.getLong(1)).foreach { case (e, rs) =>
      assert(rs.map(_.getString(2)).sorted.toSeq ===
        Seq("new-bootstrapped", "old-cleaned"), s"eighth $e origins")
    }
    // new nodes sit at the odd positions and streamed from their
    // predecessor; old nodes carry no source
    rows.filter(_.getString(2) == "new-bootstrapped").foreach { r =>
      val p = r.getLong(0)
      assert(p % 2 === 1L)
      assert(r.getLong(3) === (p - 1) / 2)
      assert(Bootstrap.bootstrapEighths(p.toInt)(r.getLong(1)))
    }
    rows.filter(_.getString(2) == "old-cleaned").foreach { r =>
      assert(r.getLong(0) % 2 === 0L && r.getLong(3) === -1L)
      assert(Cleanup.keptEighths((r.getLong(0) / 2).toInt)(r.getLong(1)))
    }
    // one real bootstrapped sstable per new node
    val outGens = Option(new java.io.File(
        Bootstrap.ensureBootstrapped(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(1702L, 1704L, 1706L, 1708L))
  }

  test("nodetool garbagecollect (q216): every file rewrites ALONE — " +
      "within-file shadowing reclaimed, cross-file duplicates " +
      "untouched, droppable winners purged only without an outside " +
      "holder (round 16)") {
    import graft.ops.GarbageCollect
    val rows = GarbageCollect.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    def g(r: org.apache.spark.sql.Row, n: String) =
      r.getLong(r.fieldIndex(n))
    rows.foreach { r =>
      // the books balance per file: in = shadowed + winners,
      // out = winners - purged
      assert(g(r, "events_in") ===
        g(r, "shadowed") + g(r, "purged") + g(r, "events_out"))
      assert(g(r, "purged") >= 0L && g(r, "shadowed") >= 0L)
    }
    // both reclaim classes bite somewhere, and tombstones survive
    // (non-droppable + guard-retained ones are NOT reclaimed)
    assert(rows.exists(g(_, "shadowed") > 0L))
    assert(rows.exists(g(_, "purged") > 0L))
    assert(rows.forall(g(_, "tombstones_out") > 0L))
    // the single-file semantic: cross-file duplicates SURVIVE — the
    // cluster still holds more events than the corpus's distinct
    // (key, clustering, column) triples
    val inPath = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val distinctTriples = DataDb.cells(spark, inPath,
        format = DataDbScan.FormatCassandra)
      .select("key", "clustering", "column_name").distinct().count()
    assert(rows.map(g(_, "events_out")).sum > distinctTriples)
    // one real rewritten file per input generation
    val outGens = Option(new java.io.File(
        GarbageCollect.ensureCollected(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === (1802L to 1807L))
  }

  test("nodetool decommission (q217): the leaving node streams each " +
      "held quarter to its new replica; the shrunk ring restores RF=2 " +
      "with only the neighbors touched (round 16)") {
    import graft.ops.Decommission
    val rows = Decommission.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(7)))
    assert(rows.forall(_.getLong(8) === 2L))
    // post-shrink holdings per survivor, and the handoff's origins:
    // node 0 gained quarter 2, node 2 gained quarter 3, node 1 is
    // untouched (a departure's blast radius is its neighbors)
    val byNode = rows.groupBy(_.getLong(0))
    (0 to 2).foreach { n =>
      assert(byNode(n.toLong).map(_.getLong(1)).toSet ===
        Decommission.holdingsAfter(n), s"node $n holdings")
    }
    val streamed = rows.filter(_.getString(2) == "streamed-in")
      .map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
    assert(streamed === Seq((2L, 0L), (3L, 2L)))
    assert(byNode(1L).forall(_.getString(2) == "retained"))
    // two real streamed sstables, one per direction
    val outGens = Option(new java.io.File(
        Decommission.ensureStreamed(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(1901L, 1903L))
  }

  test("nodetool removenode (q218): the dead node cannot stream — each " +
      "under-replicated quarter re-replicates survivor-to-survivor " +
      "from its one remaining live replica (round 16)") {
    import graft.ops.{Decommission, RemoveNode}
    val rows = RemoveNode.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(8)))
    assert(rows.forall(_.getLong(9) === 2L))
    // the converged holdings are exactly decommission's (same
    // post-shrink ring) ...
    val byNode = rows.groupBy(_.getLong(0))
    (0 to 2).foreach { n =>
      assert(byNode(n.toLong).map(_.getLong(1)).toSet ===
        Decommission.holdingsAfter(n), s"node $n holdings")
    }
    // ... but every stream SOURCE is a survivor, never node 3:
    // quarter 2 came to node 0 from node 2, quarter 3 to node 2 from
    // node 0 (the one remaining replica of each range)
    val streamed = rows.filter(_.getString(2) == "streamed-in")
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(0))).sorted.toSeq
    assert(streamed === Seq((2L, 2L, 0L), (3L, 0L, 2L)))
    assert(rows.forall(_.getLong(3) !== RemoveNode.Dead.toLong))
    // retained rows source from the node itself
    assert(rows.filter(_.getString(2) == "retained")
      .forall(r => r.getLong(3) === r.getLong(0)))
    // two real survivor-sourced streams, one per direction
    val outGens = Option(new java.io.File(
        RemoveNode.ensureStreamed(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(2001L, 2003L))
  }

  test("nodetool move (q219): the token shift streams gained eighths " +
      "from the minimal pre-move replica and cleans lost eighths away " +
      "locally; the reshaped ring keeps RF=2 (round 16)") {
    import graft.ops.Move
    val rows = Move.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 16)
    assert(rows.forall(_.getBoolean(7)))
    assert(rows.forall(_.getLong(8) === 2L))
    val byNode = rows.groupBy(_.getLong(0))
    (0 to 3).foreach { n =>
      assert(byNode(n.toLong).map(_.getLong(1)).toSet ===
        Move.holdingsAfter(n), s"node $n holdings")
    }
    // the four deltas: gains streamed (node 0 got eighth 2, node 1
    // eighth 4), losses cleaned (node 2's whole view, node 3's whole
    // view rewrote locally), untouched nodes keep the original file
    val streamed = rows.filter(_.getString(2) == "streamed-in")
      .map(r => (r.getLong(1), r.getLong(0))).sorted.toSeq
    assert(streamed === Seq((2L, 0L), (4L, 1L)))
    assert(byNode(2L).forall(_.getString(2) == "cleaned"))
    assert(byNode(3L).forall(_.getString(2) == "cleaned"))
    assert(byNode(0L).filter(_.getString(2) == "retained")
      .map(_.getLong(1)).toSet === Set(0L, 1L, 6L, 7L))
    assert(byNode(1L).filter(_.getString(2) == "retained")
      .map(_.getLong(1)).toSet === Set(0L, 1L, 2L, 3L))
    // four real output files: two streams + two cleaned rewrites
    val outGens = Option(new java.io.File(
        Move.ensureMoved(spark, Sf0001))
        .listFiles((_, n) => n.endsWith("-Data.db"))).get
      .map(_.getName.split("-")(1).toLong).sorted.toSeq
    assert(outGens === Seq(2101L, 2102L, 2153L, 2154L))
  }

  test("steady-state incremental loop (q196): zero-read on the marked " +
      "base, the next digest reads EXACTLY the fresh flush, and marking " +
      "the flush returns the digest to zero (round 16 — the one executed" +
      "-op family that shipped without a spec in r15)") {
    import graft.ops.{AntiEntropy, Repair}
    import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}
    // state 0: the fully-marked node reads nothing (the loop's start)
    val pre = AntiEntropy.incrementalTriple(spark,
      Repair.ensureRepaired(spark, Sf0001), "pre").head
    assert(pre.getLong(2) === 0L && pre.getLong(3) === 0L &&
      pre.getLong(4) === 0L && pre.getLong(5) === 0L)
    val rows = Repair.incrementalLoop(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 2)
    val (fSst, fUnrep, fEv, fLeaves, fDigest) = rows("flushed")
    val (mSst, mUnrep, mEv, mLeaves, mDigest) = rows("marked")
    // state 1: exactly ONE unrepaired file beside the marked base...
    assert(fSst === pre.getLong(1) + 1L)
    assert(fUnrep === 1L)
    // ...and the digest reads EXACTLY the flush — verification cost
    // tracks new data, not corpus size
    val base = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val sliver = DataDb.cells(spark, base,
        format = DataDbScan.FormatCassandra)
      .where(pmod(col("key"), lit(Repair.FlushSliverMod)) === 0L)
    assert(fEv === sliver.count())
    assert(fEv > 0L && fLeaves > 0L && fDigest != 0L)
    // state 2: flush marked, same files on disk, zero planned reads
    assert(mSst === fSst)
    assert(mUnrep === 0L && mEv === 0L && mLeaves === 0L &&
      mDigest === 0L)
  }

  test("streaming tier ladder (q193): the standing per-sstable model " +
      "volumes yield the SAME tier table the batch selection computes " +
      "(round 15)") {
    val got = graft.streaming.StreamingStats.tierLadderOnce(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toInt,
        r.getBoolean(3)))
      .sortBy(_._1)
    val want = graft.ops.MinorCompaction.tierTable(spark, Sf0001)
      .sortBy(_._1)
    assert(got.map(g => (g._1, g._3, g._4)) === want)
    assert(got.forall(_._2 > 0L))
  }

  test("multi-source merge repair (q194): uniform divergence defeats " +
      "single-source selection — needy leaves fan out to ALL other " +
      "replicas and the destination merge still converges everywhere " +
      "(round 15)") {
    import graft.ops.RepairMultiSource
    val s = RepairMultiSource.ensureSession(spark, Sf0001)
    // the fanout regime genuinely occurs: some (leaf, target) has BOTH
    // other replicas as sources
    assert(s.srcsFor.values.exists(_.size === 2))
    // and the q189 minimal rule still governs: a multi-source plan is
    // only issued when NO single replica matches the union there
    for (((leaf, t), ss) <- s.srcsFor) {
      def m(r: Int) = s.pre(r).get(leaf).map(_._2) ==
        s.uni.get(leaf).map(_._2)
      assert(!m(t))
      if (ss.size == 1) assert(m(ss.head))
      else {
        assert(ss.sorted === (0 until RepairMultiSource.Replicas)
          .filter(_ != t))
        (0 until RepairMultiSource.Replicas).filter(_ != t)
          .foreach(r => assert(!m(r)))
      }
    }
    val rows = RepairMultiSource.roundtrip(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // matched <=> zero sources; everyone converges post-merge
      for (i <- 0 until 3) {
        val matched = r.getBoolean(2 + i)
        val nsrc = r.getLong(5 + i)
        assert(matched === (nsrc === 0L))
        assert(r.getBoolean(8 + i),
          s"leaf ${r.getLong(0)} replica $i did not converge")
      }
    }
  }

  test("repair marking is metadata-only: every non-Statistics file " +
      "byte-identical to the base set; stats differ ONLY in repairedAt " +
      "(round 13)") {
    import graft.sources.statsdb.CassandraStatsFormat
    val base = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val marked = graft.ops.Repair.ensureRepaired(spark, Sf0001)
    val files = Option(new java.io.File(base).listFiles()).get
      .filter(_.isFile).sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val m = new java.io.File(marked, f.getName)
      assert(m.exists(), s"missing ${f.getName} in marked set")
      val a = java.nio.file.Files.readAllBytes(f.toPath)
      val b = java.nio.file.Files.readAllBytes(m.toPath)
      if (!f.getName.endsWith(CassandraStatsFormat.Suffix))
        assert(java.util.Arrays.equals(a, b),
          s"${f.getName} must be byte-identical")
      else {
        val pa = CassandraStatsFormat.parse(a)
        val pb = CassandraStatsFormat.parse(b)
        assert(pb.stats.repairedAtMs === graft.ops.Repair.RepairedAtMs)
        // BYTE-exact 'only repairedAt differs': re-serializing the BASE
        // stats with just the stamp (header component carried verbatim)
        // must reproduce the marked file bit-for-bit
        val bos = new java.io.ByteArrayOutputStream()
        CassandraStatsFormat.write(new java.io.DataOutputStream(bos),
          pa.copy(stats = pa.stats.copy(
            repairedAtMs = graft.ops.Repair.RepairedAtMs)),
          Some(CassandraStatsFormat.componentBytes(a,
            CassandraStatsFormat.TypeHeader)))
        assert(java.util.Arrays.equals(bos.toByteArray, b),
          s"${f.getName}: only repairedAt may differ")
      }
    }
  }

  test("sstablerepairedset (q209): the reset is the marking run in " +
      "reverse — byte-exact metadata-only, the unrepaired sentinel " +
      "restored, and the incremental digest re-opens EXACTLY the reset " +
      "files (round 16)") {
    import graft.ops.Repair
    import graft.sources.statsdb.CassandraStatsFormat
    val marked = Repair.ensureRepaired(spark, Sf0001)
    val reset = Repair.ensureUnrepairedReset(spark, Sf0001)
    val files = Option(new java.io.File(marked).listFiles()).get
      .filter(_.isFile).sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val r = new java.io.File(reset, f.getName)
      assert(r.exists(), s"missing ${f.getName} in reset set")
      val a = java.nio.file.Files.readAllBytes(f.toPath)
      val b = java.nio.file.Files.readAllBytes(r.toPath)
      val gen = f.getName.split("-")(1).toLong
      if (!f.getName.endsWith(CassandraStatsFormat.Suffix) ||
          !Repair.ResetGens(gen))
        assert(java.util.Arrays.equals(a, b),
          s"${f.getName} must be byte-identical")
      else {
        val pa = CassandraStatsFormat.parse(a)
        val pb = CassandraStatsFormat.parse(b)
        assert(pa.stats.repairedAtMs === Repair.RepairedAtMs)
        assert(pb.stats.repairedAtMs === 0L,
          s"${f.getName}: unrepaired sentinel not restored")
        // byte-exact 'only repairedAt differs': re-serializing the
        // MARKED stats with the sentinel reproduces the reset file
        val bos = new java.io.ByteArrayOutputStream()
        CassandraStatsFormat.write(new java.io.DataOutputStream(bos),
          pa.copy(stats = pa.stats.copy(repairedAtMs = 0L)),
          Some(CassandraStatsFormat.componentBytes(a,
            CassandraStatsFormat.TypeHeader)))
        assert(java.util.Arrays.equals(bos.toByteArray, b),
          s"${f.getName}: only repairedAt may differ")
      }
    }
    // the digest re-opens exactly the reset generations: marked state
    // plans zero reads, the reset state reads gens 1-3's events
    val rows = Repair.repairedSetRoundtrip(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val (mSst, mUnrep, mEv) = rows("marked")
    assert(mSst === 6L && mUnrep === 0L && mEv === 0L)
    val (rSst, rUnrep, rEv) = rows("reset")
    val expect = DataDb.cells(spark, marked,
        format = DataDbScan.FormatCassandra)
      .where(col("sstable_id")
        .isin(Repair.ResetGens.map(g => s"nb-$g-big").toSeq: _*))
      .count()
    assert(rSst === 6L && rUnrep === 3L && rEv === expect && rEv > 0L)
  }

  test("sstabledowngrade (q210): the full version cycle nb -> oa -> nb " +
      "reproduces the ORIGINAL file set bit-for-bit — slice blobs back " +
      "to the legacy lists, the versioned tail dropped (round 16)") {
    import graft.ops.SstableDowngrade
    import graft.sources.statsdb.CassandraStatsFormat
    val orig = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val down = SstableDowngrade.ensureDowngraded(spark, Sf0001)
    val files = Option(new java.io.File(orig).listFiles()).get
      .filter(_.isFile).sortBy(_.getName)
    assert(files.nonEmpty)
    // EVERY file — Statistics.db included — survives the cycle
    // byte-identical; a lossy upgrade or a drifting serializer breaks
    // at the first byte
    files.foreach { f =>
      val d = new java.io.File(down, f.getName)
      assert(d.exists(), s"missing ${f.getName} in downgraded set")
      assert(java.nio.file.Files.mismatch(f.toPath, d.toPath) === -1L,
        s"${f.getName} not byte-identical through the cycle")
    }
    // the downgraded stats parse as genuine 'nb': legacy lists back in
    // place, no slice, no tail
    val statsFile = files.find(_.getName.endsWith(
      CassandraStatsFormat.Suffix)).get
    val s = CassandraStatsFormat.parse(java.nio.file.Files.readAllBytes(
      new java.io.File(down, statsFile.getName).toPath)).stats
    assert(s.minClustering.nonEmpty && s.maxClustering.nonEmpty)
    assert(s.coveredClustering.isEmpty && s.tail.isEmpty)
    // and the relation's verdict columns agree on the real bytes
    val rows = SstableDowngrade.roundtrip(spark, Sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"${r.getString(0)}: cycle verdicts")
    }
  }

  test("sidecar-based compaction sizing: O(#files) driver sizing agrees " +
      "with the production DSv2 relation and drives the executed " +
      "fan-out (round 13)") {
    import graft.ops.Compaction
    val inPath = CassandraDataFixture.ensureFiles(spark, Sf0001,
      compressed = true)
    val direct = Compaction.sidecarVolumeBytes(inPath)
    // independent-reader agreement: the driver-side sidecar parse and
    // the production sstable-compression DSv2 scan see the same volume
    val viaDsv2 = graft.sources.compressioninfo.CompressionInfo
      .read(spark, inPath)
      .groupBy("generation").agg(min("data_length").as("dl"))
      .agg(sum("dl")).head.getLong(0)
    assert(direct === viaDsv2)
    // the sizing input scales with the corpus across fixture tiers
    val in01 = CassandraDataFixture.ensureFiles(spark,
      "/root/testdata/sf0.01", compressed = true)
    val direct01 = Compaction.sidecarVolumeBytes(in01)
    assert(direct01 > direct * 5)
    assert(Compaction.outputShards(direct01) >
      Compaction.outputShards(direct))
    // executed: a sidecar-sized compaction emits exactly
    // ceil(volume/target) complete compressed sstable families —
    // the sizing never ran a Spark job over the events
    val out = Compaction.ensureCompacted(spark, Sf0001,
      sidecarSized = true)
    val names = Option(new java.io.File(out).listFiles()).get.map(_.getName)
    val shards = Compaction.outputShards(direct)
    assert(names.count(_.endsWith("-Data.db")).toLong === shards)
    assert(names.count(_.endsWith("-CompressionInfo.db")).toLong === shards)
    // the uncompressed (CRC) family has no CompressionInfo.db — the
    // volume falls back to the Data.db lengths themselves
    val featPath = CassandraDataFixture.ensureFeatureFiles(spark, Sf0001)
    val featLen = Option(new java.io.File(featPath)
      .listFiles((_, n) => n.endsWith("-Data.db"))).get.map(_.length).sum
    assert(Compaction.sidecarVolumeBytes(featPath) === featLen)
  }

  test("compaction LWW merge plans as an aggregate with map-side " +
      "partial_max before the exchange — no Window, group-key-only " +
      "sorts (round 13)") {
    val ev = graft.sources.Fixtures.cells(spark, Sf0001)
    val merged = graft.ops.Compaction.mergeWinners(ev,
      graft.sources.Fixtures.GcBeforeS)
    val plan = merged.queryExecution.executedPlan.toString
    // map-side combine: partial_max(struct(...)) runs BEFORE the
    // exchange — at 100 TB the shuffle carries one pre-merged winner per
    // (key, clustering, column) per map task, not every input event.
    // (Spark plans struct-max as SortAggregate — struct buffers are not
    // UnsafeRow-mutable, so HashAggregate is impossible for this agg and
    // ObjectHashAggregate serves only typed-imperative functions; the
    // sort-based agg with partial combine IS the right available plan,
    // and its sorts are over the 3 GROUP KEYS, not the window's full
    // 11-field order.)
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Window"),
      "LWW winner selection must not plan a window")
    val sortCols = "Sort \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(sortCols.nonEmpty)
    sortCols.foreach { cols =>
      assert(!cols.contains("timestamp_us") && !cols.contains("DESC"),
        s"aggregate sorts must be group-key-only, got: $cols")
    }
  }

  test("compaction roundtrip: read -> LWW merge + purge -> write -> read " +
      "equals the parquet replay of the merge (round 10)") {
    val got = graft.ops.Compaction.compactionRoundtrip(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    // independent replay from parquet: the scan's representation mapping
    // first, then the same total order, winners minus droppable
    // tombstones, key % volume-adaptive output shards
    import org.apache.spark.sql.expressions.Window
    val mapped = graft.sources.Fixtures.cells(spark, Sf0001)
      .withColumn("ttl_s",
        when(col("is_tombstone"), -1L).otherwise(col("ttl_s")))
      .withColumn("size_bytes",
        when(col("is_tombstone"), 0L).otherwise(col("size_bytes") % 61L))
    def modelBytes(dir: String): Long = graft.sources.Fixtures.cells(spark, dir)
      .withColumn("size_bytes",
        when(col("is_tombstone"), 0L).otherwise(col("size_bytes") % 61L))
      .agg(sum(lit(graft.ops.Compaction.EventOverheadBytes)
        + col("size_bytes")))
      .head.getLong(0)
    val shards = graft.ops.Compaction.outputShards(modelBytes(Sf0001))
    val w = Window.partitionBy("key", "clustering", "column_name")
      .orderBy(col("timestamp_us").desc, col("sstable_id").desc,
        col("size_bytes").desc, col("is_tombstone").desc,
        col("local_deletion_time_s").desc, col("ttl_s").desc,
        col("is_expiring").desc, col("kind").desc)
    val M = 1000003L
    val want = mapped.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && !(col("is_tombstone") &&
        col("local_deletion_time_s") < graft.sources.Fixtures.GcBeforeS))
      .groupBy(concat(lit("sst-"), pmod(col("key"), lit(shards)))
        .as("sstable_id"))
      .agg(count(lit(1)).as("events"),
        sum(when(col("kind") === "CELL", 1L).otherwise(0L)).as("cells"),
        sum(when(col("kind") === "RANGE_TOMBSTONE_MARKER", 1L)
          .otherwise(0L)).as("markers"),
        countDistinct("key").as("partitions"),
        sum(col("key") % M).as("keys_sum"),
        sum(col("clustering") % M).as("clustering_sum"),
        sum(col("timestamp_us") % M).as("ts_sum"),
        sum(col("ttl_s") % M).as("ttl_sum"),
        sum(col("local_deletion_time_s") % M).as("ldt_sum"),
        sum(when(col("is_tombstone"), 1L).otherwise(0L)).as("tombstones"),
        sum(when(col("is_expiring"), 1L).otherwise(0L)).as("expiring"),
        sum(when(col("is_live"), 1L).otherwise(0L)).as("live"),
        sum(col("size_bytes") % M).as("value_sum"))
      .orderBy("sstable_id")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
    // physical shape: one complete compressed sstable per computed shard
    val out = graft.ops.Compaction.ensureCompacted(spark, Sf0001)
    val names = Option(new java.io.File(out).listFiles()).get
      .map(_.getName).toSet
    assert(names.count(_.endsWith("-Data.db")) === shards)
    assert(names.count(_.endsWith("-CompressionInfo.db")) === shards)
    // volume-adaptive sizing (round 11): the shard count SCALES with the
    // input's modeled uncompressed volume — a 10x tier plans ~10x the
    // outputs (asserted via the model at two fixture scales; the q162
    // oracle replays the same ceil(sum(32+size)/target) function)
    val b001 = modelBytes(Sf0001)
    val b01 = modelBytes("/root/testdata/sf0.01")
    assert(b01 > b001 * 5)
    assert(graft.ops.Compaction.outputShards(b01) >
      graft.ops.Compaction.outputShards(b001))
    assert(graft.ops.Compaction.outputShards(b001) === shards)
    // compaction compacts: fewer surviving events than input events
    val inputEvents = graft.sources.Fixtures.cells(spark, Sf0001).count()
    val outputEvents = got.map(_(1).asInstanceOf[Long]).sum
    assert(outputEvents < inputEvents)
  }

  test("feature compaction: shadowed events absent from the executed " +
      "output; tombstones purge by gc cutoff (round 11)") {
    import graft.ops.FeatureCompaction
    import graft.sources.datadb.DataDbFormat
    val keys = graft.sources.Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey").cast("long")).distinct()
      .collect().map(_.getLong(0))
    def readBack(gc: Long) = DataDb.read(spark,
        FeatureCompaction.ensureCompacted(spark, Sf0001, gc),
        format = DataDbScan.FormatCassandra)
      .withColumn("k", graft.sources.BinaryKeys.beLong(col("key")))
    val evA = readBack(FeatureCompaction.GcA).cache()
    val evB = readBack(FeatureCompaction.GcB).cache()
    val T0 = CassandraDataFixture.FeatureT0
    // 1) PARTITION deletion shadowing: for a deleted partition (k%19==0)
    // every cell with ts <= markedForDeleteAt is gone from the output —
    // and the input provably HAD such cells (the mfda bisects them)
    val kPd = keys.filter(_ % 19 == 0).min
    val mfda = T0 + kPd * 10 + 2
    val inEv = DataDb.read(spark,
        CassandraDataFixture.ensureFeatureFiles(spark, Sf0001),
        format = DataDbScan.FormatCassandra)
      .withColumn("k", graft.sources.BinaryKeys.beLong(col("key")))
    assert(inEv.where(col("k") === kPd &&
      col("kind").isin(DataDbFormat.KindCell, DataDbFormat.KindStaticCell) &&
      col("timestamp_us") <= mfda).count() > 0)
    assert(evA.where(col("k") === kPd &&
      col("kind").isin(DataDbFormat.KindCell, DataDbFormat.KindStaticCell) &&
      col("timestamp_us") <= mfda).count() === 0)
    // the deletion itself is retained under GcA (D2 band >= GcA)
    assert(evA.where(col("k") === kPd &&
      col("kind") === DataDbFormat.KindPartitionDeletion).count() === 1)
    // 2) ROW deletion shadowing: clustering-0 cells of a row-deleted,
    // not-partition-deleted key are gone
    val kRd = keys.filter(k => k % 11 == 0 && k % 19 != 0).min
    assert(inEv.where(col("k") === kRd && col("clustering") === 0L &&
      col("kind") === DataDbFormat.KindCell).count() > 0)
    assert(evA.where(col("k") === kRd && col("clustering") === 0L &&
      col("kind") === DataDbFormat.KindCell).count() === 0)
    // 3) COMPLEX deletion shadowing: tags cells of a complex-deleted key
    // are gone while its c0 cells (not covered by the complex deletion)
    // survive on rows the row/partition deletions don't reach
    val kCd = keys.filter(k =>
      k % 13 == 0 && k % 19 != 0 && k % 11 != 0).min
    assert(inEv.where(col("k") === kCd &&
      col("column_name") === "tags" &&
      col("kind") === DataDbFormat.KindCell).count() > 0)
    assert(evA.where(col("k") === kCd && col("column_name") === "tags" &&
      col("kind") === DataDbFormat.KindCell).count() === 0)
    assert(evA.where(col("k") === kCd && col("column_name") === "c0" &&
      col("kind") === DataDbFormat.KindCell).count() === kCd % 3 + 1)
    // its complex deletions survive (one per row, empty column slot —
    // the emptyComplexColumns write path)
    assert(evA.where(col("k") === kCd &&
      col("kind") === DataDbFormat.KindComplexDeletion).count() ===
      kCd % 3 + 1)
    // 4) gc purge branches: GcA retains exactly the row deletions in the
    // upper half of the D1 ldt band; GcB (above the whole band) purges
    // every row deletion but keeps only the upper partition-deletion band
    val expRowDelsA = keys.count(k => k % 11 == 0 && k % 100 >= 50) +
      keys.count(k => k % 3 == 0 && k % 17 == 0 && k % 70 >= 50)
    assert(evA.where(col("kind") === DataDbFormat.KindRowDeletion)
      .count() === expRowDelsA)
    assert(evB.where(col("kind") === DataDbFormat.KindRowDeletion)
      .count() === 0)
    val expPdB = keys.count(k => k % 19 == 0 && k % 40 >= 20)
    assert(evB.where(col("kind") === DataDbFormat.KindPartitionDeletion)
      .count() === expPdB)
    assert(evA.where(col("kind") === DataDbFormat.KindPartitionDeletion)
      .count() === keys.count(_ % 19 == 0))
    // 5) feature-sink validation: unknown schema modes, chunked
    // compression and missing columns are rejected up front
    val someEv = inEv.limit(1)
      .select(lit("fb-0").as("sstable_id"),
        graft.sources.BinaryKeys.beLong(col("key")).as("key"),
        col("clustering"), col("column_name"), col("kind"),
        col("timestamp_us"), col("ttl_s"), col("local_deletion_time_s"))
    val tmpOut = java.nio.file.Files.createTempDirectory("graft-fsink-rej")
    try {
      def rejected(f: => Unit): String =
        intercept[IllegalArgumentException](f).getMessage
      assert(rejected {
        someEv.write.format("sstable-data").option("path", tmpOut.toString)
          .option("schema", "nope").mode("append").save()
      }.contains("schema option"))
      assert(rejected {
        someEv.write.format("sstable-data").option("path", tmpOut.toString)
          .option("schema", "feature").option("compressed", "true")
          .mode("append").save()
      }.contains("uncompressed"))
      assert(rejected {
        someEv.drop("kind").write.format("sstable-data")
          .option("path", tmpOut.toString).option("schema", "feature")
          .mode("append").save()
      }.contains("kind"))
    } finally {
      Option(tmpOut.toFile.listFiles()).foreach(_.foreach(_.delete()))
      java.nio.file.Files.deleteIfExists(tmpOut)
    }
    // 6) the compacted output is a COMPLETE sstable family: every
    // sidecar present per output generation (round 11)
    val outPath = graft.ops.FeatureCompaction.ensureCompacted(spark,
      Sf0001, graft.ops.FeatureCompaction.GcA)
    val outDir = new java.io.File(outPath)
    val names = Option(outDir.listFiles()).get.map(_.getName).toSet
    val gens = names.collect { case n if n.endsWith("-Data.db") =>
      n.stripSuffix("-Data.db")
    }
    assert(gens.nonEmpty)
    for (g <- gens; c <- Seq("-Data.db", "-Index.db", "-Statistics.db",
        "-Filter.db", "-Summary.db", "-Digest.crc32", "-CRC.db",
        "-TOC.txt"))
      assert(names.contains(g + c), s"missing $g$c")
    // 7) ...and the sidecars are FUNCTIONAL: a pushed point read over
    // the compacted output plans exactly the probed partition's range
    // through its fresh Filter/Summary/Index.db (absent keys plan
    // nothing), and the relation matches the unpushed scan
    val keyBytes = java.nio.ByteBuffer.allocate(8).putLong(kPd).array()
    val pushedScan = DataDb.read(spark, outPath,
        format = DataDbScan.FormatCassandra)
      .where(col("key") === keyBytes)
    assert(pushedScan.rdd.getNumPartitions === 1,
      "one planned range for one surviving key")
    val absent = DataDb.read(spark, outPath,
        format = DataDbScan.FormatCassandra)
      .where(col("key") ===
        java.nio.ByteBuffer.allocate(8).putLong(-kPd - 1L).array())
    assert(absent.rdd.getNumPartitions === 0,
      "absent keys pruned by the compacted output's own bloom/index")
    assert(pushedScan.count() ===
      evA.where(col("k") === kPd).count())
    evA.unpersist(); evB.unpersist()
  }

  test("slice pushdown: key + clustering bounds plan mid-partition block " +
      "runs far smaller than the partitions (round 10)") {
    import graft.sources.datadb.DataDbInputPartition
    val path = CassandraDataFixture.ensureWideFiles(spark, Sf0001)
    val kb = java.nio.ByteBuffer.allocate(8).putLong(3L).array()
    val sliced = DataDb.read(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .where(col("key") === kb &&
        col("clustering") >= 1200L && col("clustering") <= 2800L)
    // planned ranges: one SLICE run per sstable, starting mid-partition
    // (seeded with the key) and covering a small fraction of the
    // partition's byte span
    val parts = sliced.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.partitions.length
    }
    val wholePartition = DataDb.read(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .where(col("key") === kb)
    val rangesOf = { df: org.apache.spark.sql.DataFrame =>
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.batch.planInputPartitions().toSeq.collect {
            case p: DataDbInputPartition => p
          }
      }.flatten
    }
    val sliceRanges = rangesOf(sliced)
    val pointRanges = rangesOf(wholePartition)
    assert(sliceRanges.nonEmpty && parts.exists(_ === sliceRanges.length))
    assert(sliceRanges.length === pointRanges.length,
      "one slice run per sstable holding the key")
    val sliceBytes = sliceRanges.map(p => p.end - p.start).sum
    val partitionBytes = pointRanges.map(p => p.end - p.start).sum
    assert(sliceBytes * 3 < partitionBytes,
      s"slice read $sliceBytes bytes vs partition $partitionBytes — " +
        "block selection is not narrowing")
    assert(sliceRanges.forall(_.midPartitionKey != null),
      "slice ranges must start at seeded block boundaries")

    // relation parity with the unpushed (decoded-column) filter form
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("sstable_id")
      .agg(count(lit(1)).as("events"),
        sum(col("clustering")).as("cl"),
        sum(col("timestamp_us") % 1000003L).as("ts"))
      .orderBy("sstable_id").collect().map(_.toSeq).toSeq
    val viaPush = agg(sliced)
    val viaScan = agg(DataDb.read(spark, path,
        maxSplitBytes = Some(8L << 10), format = DataDbScan.FormatCassandra)
      .withColumn("k2", graft.sources.BinaryKeys.beLong(col("key")))
      .where(col("k2") === 3L &&
        col("clustering") >= 1200L && col("clustering") <= 2800L)
      .drop("k2"))
    assert(viaPush === viaScan)
  }
}
