package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Fixtures
import graft.sources.datadb.CassandraDataFixture

/** `sstableexpiredblockers` (round 14) — the Cassandra operator tool
  * that answers "why is this fully-expired sstable still on disk?":
  *
  *  - an sstable is FULLY EXPIRED when its Statistics.db
  *    maxLocalDeletionTime is below gcBefore — every cell and marker in
  *    it is a tombstone already past its grace period;
  *  - such an sstable still cannot drop while some OTHER live sstable
  *    OVERLAPS its key range with OLDER data (min timestamp below the
  *    candidate's max): dropping the file would un-shadow rows its
  *    tombstones still cover. Those sstables are its BLOCKERS — the
  *    relation Cassandra's `SSTableExpiredBlockers` prints and TWCS
  *    operators read before chasing disk-space mysteries.
  *
  * Like the reference's summary/sstables commands this is METADATA
  * ONLY: min/max timestamp and max deletion time from each sstable's
  * own Statistics.db, key ranges from each Summary.db tail — O(#files)
  * driver sidecar parses, zero data-file reads, O(#files²) candidate ×
  * blocker comparison (Cassandra's own tool is the same quadratic over
  * one table's sstable list). The q178 oracle replays the whole
  * derivation — band assignment, per-sstable stats, candidacy and the
  * blocker join — from parquet. */
object ExpiredBlockers {

  final case class Meta(sstableId: String, firstKey: Long, lastKey: Long,
      minTsUs: Long, maxTsUs: Long, maxLdtS: Long)

  /** THE blocker rule, shared by the report (q178) and the executed
    * TWCS drop decision (q188/q190/q191): live sstable `b` blocks
    * fully-expired candidate `c` when their key ranges overlap and
    * b's min timestamp is at or below c's max (Cassandra drops only
    * when every overlapping sstable is STRICTLY newer — an equal
    * timestamp still blocks). Expiry itself (maxLdt < gcBefore) is the
    * caller's candidacy test; this is purely the overlap half. */
  def blocks(b: Meta, c: Meta): Boolean =
    b.firstKey <= c.lastKey && b.lastKey >= c.firstKey &&
      b.minTsUs <= c.maxTsUs

  /** Per-sstable sidecar metadata under `path` (same shape as
    * [[LeveledCompaction.metadata]] plus the timestamp/deletion-time
    * stats the expiry decision reads). */
  def metadata(path: String): Seq[Meta] = {
    val d = new java.io.File(path)
    val bases = Option(d.listFiles((_, n) => n.endsWith("-Data.db")))
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName.stripSuffix("-Data.db")).sorted.toSeq
    require(bases.nonEmpty, s"no sstables under $path")
    bases.map { base =>
      val gen = base.split("-")(1).toLong
      val stats = graft.sources.statsdb.CassandraStatsFormat.parse(
        java.nio.file.Files.readAllBytes(
          new java.io.File(d, base + "-Statistics.db").toPath)).stats
      val summary = graft.sources.summarydb.SummaryDbFormat.parse(
        new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(
            new java.io.File(d, base + "-Summary.db")))))
      def be(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
      Meta(s"sst-${gen - 1}", be(summary.firstKey), be(summary.lastKey),
        stats.minTimestampUs, stats.maxTimestampUs,
        stats.maxLocalDeletionTimeS.toLong)
    }
  }

  /** q178: one row per (fully-expired sstable, blocking sstable) pair
    * over the TWCS-banded real set, from sidecars alone. */
  def blockers(spark: SparkSession, dir: String,
      gcBeforeS: Long = Fixtures.GcBeforeS): DataFrame = {
    val metas = metadata(CassandraDataFixture.ensureTwcsFiles(spark, dir))
    val expired = metas.filter(_.maxLdtS < gcBeforeS)
    val live = metas.filterNot(_.maxLdtS < gcBeforeS)
    val rows = for {
      c <- expired
      b <- live
      if blocks(b, c)
    } yield (c.sstableId, c.maxTsUs, c.maxLdtS, b.sstableId, b.minTsUs)
    import spark.implicits._
    rows.toDF("blocked_id", "blocked_max_ts", "blocked_max_ldt",
        "blocker_id", "blocker_min_ts")
      .orderBy("blocked_id", "blocker_id")
  }
}
