package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.compressioninfo.{ChunkedData, CompressionInfoFormat}
import graft.sources.datadb.{CassandraDataFixture, CassandraDataFormat}
import graft.sources.indexdb.IndexDbFormat
import graft.sources.statsdb.CassandraStatsFormat

/** CLUSTERING-SLICE reads through the promoted (row) index — the second
  * half of what `RowIndexEntry` buys Cassandra's read path (q114's point
  * get is the first): a slice `[lo, hi]` over one partition's clustering
  * column decodes ONLY the index blocks whose stored clustering bounds
  * overlap the slice, seeking straight to the first overlapping block's
  * offset (through the compression chunk table) and stopping at the last
  * one's end. Everything outside those blocks is never read — q112 proved
  * the blocks TILE; this proves their clustering bounds PRUNE.
  *
  * Runs over the wide-partition set (8 huge partitions per sstable,
  * clustering = the original corpus key), whose every partition spans
  * many blocks. The per-probe oracle replay is fully relational,
  * INCLUDING `blocks_scanned`: the fixture's block trigger (every
  * [[CassandraDataFixture.RowsPerBlock]] unfiltereds in clustering order,
  * markers before the row of the same clustering) is replayed with a
  * row_number window, so a reader that scans one block too many or too
  * few hash-mismatches — block selection itself is oracle-checked. */
object SliceGet {

  private val ChkMod = 1000003L

  /** Deterministic probe slices: per wide key k, a low band shared by all
    * partitions and a k-specific band (empty at small scale for large k —
    * an empty slice must prune to ZERO blocks read). */
  def probes: Seq[(Long, Long, Long)] =
    (0L until CassandraDataFixture.WidePartitions).flatMap(k =>
      Seq((k, 0L, 500L), (k, k * 1000L, k * 1000L + 999L)))

  private final case class SstableRefs(base: String,
      info: CompressionInfoFormat.Info,
      header: CassandraDataFormat.SerializationHeaderInfo,
      dataPath: java.nio.file.Path, dataFileLen: Long,
      entries: Map[Long, (Long, Array[Byte])]) // wkey -> (pos, promoted)

  private def loadRefs(dir: java.nio.file.Path, base: String): SstableRefs = {
    def bytes(suffix: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(dir.resolve(base + suffix))
    val info = CompressionInfoFormat.parse(bytes(CompressionInfoFormat.Suffix))
    val header = CassandraDataFormat.parseHeader(
      CassandraStatsFormat.componentBytes(
        bytes(CassandraDataFormat.StatsSuffix),
        CassandraStatsFormat.TypeHeader))
    val in = new java.io.FileInputStream(
      dir.resolve(base + IndexDbFormat.Suffix).toFile)
    val entries =
      try IndexDbFormat.fullEntries(in).map { e =>
        java.nio.ByteBuffer.wrap(e.key).getLong -> (e.position, e.promoted)
      }.toMap
      finally in.close()
    val dataPath = dir.resolve(base + CassandraDataFormat.Suffix)
    SstableRefs(base, info, header, dataPath,
      java.nio.file.Files.size(dataPath), entries)
  }

  /** Decode the uncompressed byte range [start, end) of a partition whose
    * key header lives elsewhere (startKey seeds the decoder), folding only
    * events whose clustering is within [lo, hi]. */
  private def readBlocks(r: SstableRefs, startKey: Array[Byte], start: Long,
      end: Long, lo: Long, hi: Long): (Long, Long, Long) = {
    val raf = new java.io.RandomAccessFile(r.dataPath.toFile, "r")
    val source = new ChunkedData.RandomAccess {
      override def readFully(position: Long, buf: Array[Byte], off: Int,
          len: Int): Unit = { raf.seek(position); raf.readFully(buf, off, len) }
      override def close(): Unit = raf.close()
    }
    val chunked =
      new ChunkedData.ChunkedInputStream(source, r.info, r.dataFileLen, start)
    try {
      var consumed = 0L
      val counting = new java.io.InputStream {
        override def read(): Int = {
          val b = chunked.read(); if (b >= 0) consumed += 1; b
        }
        override def read(buf: Array[Byte], off: Int, len: Int): Int = {
          val n = chunked.read(buf, off, len); if (n > 0) consumed += n; n
        }
      }
      var events = 0L; var valueSum = 0L; var tsSum = 0L
      CassandraDataFormat.events(counting, r.header,
        () => consumed >= end - start, startKey = startKey).foreach { e =>
        if (e.clustering >= lo && e.clustering <= hi) {
          events += 1
          valueSum += e.sizeBytes
          tsSum += e.timestampUs % ChkMod
        }
      }
      (events, valueSum, tsSum)
    } finally chunked.close()
  }

  /** CLI surface (`slice`): one (key, lo, hi) slice probed driver-side
    * across every sstable of the wide set — per sstable: overlapping
    * block count and the in-range event fold. */
  def sliceOne(spark: SparkSession, dir: String, key: Long, lo: Long,
      hi: Long): Seq[(String, Long, Long, Long)] = {
    val path = CassandraDataFixture.ensureWideFiles(spark, dir)
    val dirPath = java.nio.file.Paths.get(path)
    val kb = java.nio.ByteBuffer.allocate(8).putLong(key).array()
    val bases = {
      val s = java.nio.file.Files.list(dirPath)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(CassandraDataFormat.Suffix))
          .map(_.stripSuffix(CassandraDataFormat.Suffix)).toArray.sorted
      } finally s.close()
    }
    bases.toSeq.map { base =>
      val r = loadRefs(dirPath, base)
      r.entries.get(key) match {
        case None => (base, 0L, 0L, 0L)
        case Some((pos, promoted)) =>
          val pi = CassandraDataFormat.parsePromotedIndex(promoted)
          val overl = pi.blocks.filter(b =>
            b.lastClustering >= lo && b.firstClustering <= hi)
          if (overl.isEmpty) (base, 0L, 0L, 0L)
          else {
            val start = pos + overl.head.offset
            val end = pos + overl.last.offset + overl.last.width
            val (e, v, _) = readBlocks(r, kb, start, end, lo, hi)
            (base, overl.length.toLong, e, v)
          }
      }
    }
  }

  /** q115: every probe slice against every sstable of the wide set. */
  def sliceRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = CassandraDataFixture.ensureWideFiles(spark, dir)
    // ordered output comes from range-sorting the PROBE INPUT (round 19,
    // q114's fix): an output-side orderBy's range sampling pass would
    // execute the whole block-decode map twice; the probes are a tiny
    // local dataset, so sampling them is free, and mapPartitions
    // preserves the per-partition order
    spark.createDataset(probes)
      .repartitionByRange(4, col("_1"), col("_2"))
      .sortWithinPartitions("_1", "_2")
      .mapPartitions { it =>
      val dirPath = java.nio.file.Paths.get(path)
      val bases = {
        val s = java.nio.file.Files.list(dirPath)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(CassandraDataFormat.Suffix))
            .map(_.stripSuffix(CassandraDataFormat.Suffix)).toArray.sorted
        } finally s.close()
      }
      val cache = scala.collection.mutable.Map.empty[String, SstableRefs]
      it.map { case (k, lo, hi) =>
        val kb = java.nio.ByteBuffer.allocate(8).putLong(k).array()
        var blocks = 0L; var events = 0L; var valueSum = 0L; var tsSum = 0L
        bases.foreach { base =>
          val r = cache.getOrElseUpdate(base, loadRefs(dirPath, base))
          r.entries.get(k).foreach { case (pos, promoted) =>
            // wide partitions always span many blocks; a missing promoted
            // index here means the fixture model broke, never "small"
            if (promoted.isEmpty)
              throw new IllegalStateException(s"unindexed wide partition $k")
            val pi = CassandraDataFormat.parsePromotedIndex(promoted)
            val overl = pi.blocks.filter(b =>
              b.lastClustering >= lo && b.firstClustering <= hi)
            if (overl.nonEmpty) {
              blocks += overl.length
              val start = pos + overl.head.offset
              val end = pos + overl.last.offset + overl.last.width
              val (e, v, t) = readBlocks(r, kb, start, end, lo, hi)
              events += e; valueSum += v; tsSum += t
            }
          }
        }
        (k, lo, hi, blocks, events, valueSum, tsSum)
      }
    }.toDF("wkey", "lo", "hi", "blocks_scanned", "events", "value_sum",
      "ts_sum")
  }
}
