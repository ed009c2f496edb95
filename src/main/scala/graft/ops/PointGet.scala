package graft.ops

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Fixtures
import graft.sources.compressioninfo.{ChunkedData, CompressionInfoFormat}
import graft.sources.datadb.{CassandraDataFixture, CassandraDataFormat}
import graft.sources.filterdb.FilterDbFormat
import graft.sources.indexdb.IndexDbFormat
import graft.sources.statsdb.CassandraStatsFormat
import graft.sources.summarydb.SummaryDbFormat

/** The big-format POINT-READ access path, composed end to end from the
  * real per-sstable components exactly as Cassandra's own read path does
  * (the reference never reads rows at all — this is the `get` the engine
  * adds on top of the same files):
  *
  *   Filter.db bloom (negative ⇒ the sstable is never touched again)
  *     → Summary.db (rightmost sampled entry ≤ key bounds the scan)
  *     → Index.db (≤ min_index_interval entries read from that offset)
  *     → Data.db (partition decoded from its uncompressed position
  *       through the CompressionInfo.db chunk table, stopping at the
  *       NEXT partition's position — single-partition I/O).
  *
  * Scale shape: probes stay distributed (narrow mapPartitions, no
  * shuffle); each task lazily caches one bloom/summary/header per sstable
  * it meets (KBs each) and seeks Data.db per probe — the per-probe cost is
  * O(interval) index entries + one partition's chunks, independent of
  * sstable size. Absent keys cost ONE bloom check per sstable (false
  * positives additionally cost the bounded index scan, never a Data.db
  * read, since the key cannot be found in the index).
  *
  * q114 probes every `key % 7 == 0` partition key (present) and its
  * negation (absent) against all sstables and checksums the decoded
  * events; the oracle replays both sides relationally. Instrumentation
  * counters let the spec pin the pruning claims (bloom rejects happen;
  * absent probes never reach Data.db). */
object PointGet {

  // spec instrumentation (same-JVM local mode): access-path step counters
  val bloomChecks = new java.util.concurrent.atomic.LongAdder
  val bloomRejects = new java.util.concurrent.atomic.LongAdder
  val indexScans = new java.util.concurrent.atomic.LongAdder
  // entries consumed across all bounded scans: the quantity a coarser
  // summary (index-summary redistribution, q246) trades memory against
  val indexEntriesRead = new java.util.concurrent.atomic.LongAdder
  val dataReads = new java.util.concurrent.atomic.LongAdder

  private val ChkMod = 1000003L

  private[ops] final case class SstableRefs(base: String,
      bloom: FilterDbFormat.Filter, summary: SummaryDbFormat.Summary,
      info: CompressionInfoFormat.Info,
      header: CassandraDataFormat.SerializationHeaderInfo,
      dataPath: java.nio.file.Path, dataFileLen: Long,
      // held open for the task's lifetime: a point read costs a seek,
      // not a file open (closed by the task-completion listener / the
      // driver-side caller)
      raf: java.io.RandomAccessFile,
      // Index.db cached per task: the summary-bounded scan becomes an
      // in-memory slice walk instead of an open+skip per probe. Fixture
      // scale holds whole files; a multi-GB production index would keep
      // the open handle + page cache and seek instead — the ACCESS
      // PATTERN (<= interval entries from the floor offset) is identical
      indexBytes: Array[Byte]) {
    // One REUSABLE chunk stream per sstable per task (round 19): a point
    // read seeks it instead of building a fresh stream — with the probe
    // input range-sorted, consecutive probes mostly land in the already-
    // decompressed chunk, so the per-probe chunk decompress (and the two
    // chunk-sized buffer allocations) collapse to one per chunk WALKED
    // rather than one per probe. Single-threaded within a task by
    // construction (mapPartitions row handling is sequential).
    private var cursor: ChunkedData.ChunkedInputStream = null
    private[ops] def chunkedAt(pos: Long): ChunkedData.ChunkedInputStream = {
      if (cursor == null) {
        val raf0 = raf
        val source = new ChunkedData.RandomAccess {
          override def readFully(position: Long, buf: Array[Byte],
              off: Int, len: Int): Unit =
            { raf0.seek(position); raf0.readFully(buf, off, len) }
          override def close(): Unit = ()
        }
        cursor = new ChunkedData.ChunkedInputStream(source, info,
          dataFileLen, pos)
      } else cursor.seekTo(pos)
      cursor
    }
  }

  private[ops] def loadRefs(dir: java.nio.file.Path, base: String): SstableRefs = {
    def bytes(suffix: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(dir.resolve(base + suffix))
    val bloom = FilterDbFormat.parse(new java.io.DataInputStream(
      new ByteArrayInputStream(bytes(FilterDbFormat.Suffix))))
    val summary = SummaryDbFormat.parse(new DataInputStream(
      new ByteArrayInputStream(bytes(SummaryDbFormat.Suffix))))
    val info = CompressionInfoFormat.parse(bytes(CompressionInfoFormat.Suffix))
    val header = CassandraDataFormat.parseHeader(
      CassandraStatsFormat.componentBytes(
        bytes(CassandraDataFormat.StatsSuffix),
        CassandraStatsFormat.TypeHeader))
    val dataPath = dir.resolve(base + CassandraDataFormat.Suffix)
    SstableRefs(base, bloom, summary, info, header, dataPath,
      java.nio.file.Files.size(dataPath),
      new java.io.RandomAccessFile(dataPath.toFile, "r"),
      bytes(IndexDbFormat.Suffix))
  }

  private[ops] def keyOf(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).getLong

  /** Rightmost summary entry with key ≤ probe (signed-long key order, the
    * fixture's 8-byte BE keys), or -1 when the probe precedes all. */
  private def summaryFloor(s: SummaryDbFormat.Summary, probe: Long): Int = {
    var lo = 0; var hi = s.entries.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (keyOf(s.entries(mid).key) <= probe) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  /** Index.db scan from the summary-bounded offset: the probe's own entry
    * position plus the NEXT entry's position (single-partition read
    * bound; data_length when the probe is the file's last partition). */
  private[ops] def indexLookup(r: SstableRefs,
      probe: Long): Option[(Long, Long)] = {
    val at = summaryFloor(r.summary, probe)
    if (at < 0) return None
    indexScans.increment()
    val off = r.summary.entries(at).position
    val in = new java.io.ByteArrayInputStream(r.indexBytes, off.toInt,
      r.indexBytes.length - off.toInt)
    var found = -1L
    val it = IndexDbFormat.entries(in)
    while (it.hasNext) {
      val e = it.next()
      indexEntriesRead.increment()
      val k = keyOf(e.key)
      if (found >= 0) return Some((found, e.position))
      if (k == probe) found = e.position
      else if (k > probe) return None
    }
    if (found >= 0) Some((found, r.info.dataLength)) else None
  }

  /** Decode one partition's events from its uncompressed [pos, next) range
    * through the chunk table; returns (events, value_sum, ts_sum%M). */
  private[ops] def readPartition(r: SstableRefs, pos: Long,
      next: Long): (Long, Long, Long) = {
    dataReads.increment()
    // task-cached reusable stream: seek, don't rebuild (its underlying
    // source close is a no-op — the raf belongs to the task listener)
    val chunked = r.chunkedAt(pos)
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
      () => consumed >= next - pos).foreach { e =>
      events += 1
      valueSum += e.sizeBytes
      tsSum += e.timestampUs % ChkMod
    }
    (events, valueSum, tsSum)
  }

  /** CLI surface (`get`): probe ONE key across every sstable,
    * driver-side — a point read needs no Spark job; per sstable it costs
    * a bloom check, at most an interval-bounded index scan, and at most
    * one partition decode. Returns (sstable, outcome, events, value
    * bytes) per sstable. */
  def getOne(spark: SparkSession, dir: String,
      key: Long): Seq[(String, String, Long, Long)] = {
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = true)
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
      try {
        if (!r.bloom.mightContain(kb)) (base, "bloom-miss", 0L, 0L)
        else indexLookup(r, key) match {
          case Some((pos, next)) =>
            val (e, v, _) = readPartition(r, pos, next)
            (base, "found", e, v)
          case None => (base, "index-miss", 0L, 0L)
        }
      } finally r.raf.close()
    }
  }

  /** q114: point-get every probe key through bloom → summary → index →
    * single-partition data decode, across all sstables of the compressed
    * real-format set. */
  def pointGet(spark: SparkSession, dir: String): DataFrame =
    // ordered output comes from range-sorting the PROBE INPUT (cheap
    // longs) before the opaque decode map — mapPartitions preserves the
    // per-partition order and the range exchange orders the partitions,
    // so the result is ascending by probe_key exactly as the former
    // output-side orderBy produced. An output-side orderBy's range
    // sampling pass re-executed the whole decode map a second time
    // (round 19, guide §1.2: don't compute things you throw away); now
    // only the cheap probe relation is sampled twice.
    pointGetUnsorted(spark, dir, sortProbes = true)

  private[graft] def pointGetUnsorted(spark: SparkSession,
      dir: String, sortProbes: Boolean = false): DataFrame = {
    import spark.implicits._
    val path = CassandraDataFixture.ensureFiles(spark, dir, compressed = true)
    // key 0 is excluded: its "absent" negation would be itself
    val present = Fixtures.liPscan(spark, dir).select(col("key"))
      .where(col("key") % 7 === 0 && col("key") > 0).distinct()
    val unordered = present.union(present.select((-col("key")).as("key")))
    val probes =
      (if (sortProbes) unordered.orderBy("key") else unordered).as[Long]
    probes.mapPartitions { it =>
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
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ =>
          cache.values.foreach(r =>
            try r.raf.close() catch { case _: Throwable => () })))
      it.map { probe =>
        val kb = java.nio.ByteBuffer.allocate(8).putLong(probe).array()
        var found = 0L; var events = 0L; var valueSum = 0L; var tsSum = 0L
        bases.foreach { base =>
          val r = cache.getOrElseUpdate(base, loadRefs(dirPath, base))
          bloomChecks.increment()
          if (!r.bloom.mightContain(kb)) bloomRejects.increment()
          else indexLookup(r, probe).foreach { case (pos, next) =>
            val (e, v, t) = readPartition(r, pos, next)
            found += 1; events += e; valueSum += v; tsSum += t
          }
        }
        (probe, found, events, valueSum, tsSum)
      }
    }.toDF("probe_key", "found_sstables", "events", "value_sum", "ts_sum")
  }
}
