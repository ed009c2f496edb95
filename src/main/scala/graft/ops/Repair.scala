package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}
import graft.sources.statsdb.CassandraStatsFormat

/** INCREMENTAL-REPAIR marking (round 13) — the metadata half of
  * Cassandra's anti-entropy cycle: once ranges verify (q173's digests),
  * the node stamps `repairedAt` into each participating sstable's
  * Statistics.db so future incremental repairs skip already-repaired
  * data. The reference SURFACES this field (`SSTableMetadata.isRepaired
  * / repairedAt`, CassandraBackend.java:89-123, the summary command's
  * repaired rollup) but can never produce it; this operator executes
  * the state transition on real files.
  *
  * The rewrite is METADATA-ONLY and byte-faithful: Data.db and every
  * other sidecar copy through untouched (Digest.crc32 covers Data.db,
  * so it stays valid); Statistics.db is re-serialized with ONLY
  * `repairedAtMs` changed — the serialization header component is
  * carried over verbatim from the original bytes, so the production
  * data scan still decodes through the rewritten stats file. q174
  * proves exactly that: the marked set is re-read through the FULL
  * scan (events equal the base set) and through the stats source
  * (every sstable now repaired at the stamped time), against a parquet
  * oracle. The summary command's F5 repaired predicate flips from
  * zero to everything on the marked copy. */
object Repair {

  /** Deterministic repair timestamp (a fixed epoch ms — repair time is
    * an input in a real deployment, a constant here so the oracle
    * replays it). */
  val RepairedAtMs = 1600000000000L

  private val memo =
    new java.util.HashMap[String, (SparkSession, Slot[String])]()

  private def sweep(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue._1.sparkContext.isStopped) it.remove()
  }

  /** The base compressed set copied with every Statistics.db stamped
    * repaired; returns the marked directory (session-memoized). */
  def ensureRepaired(spark: SparkSession, dir: String): String =
    ensureMarked(spark, dir, "repaired", _ => true)

  /** Generations the PARTIAL marking stamps (q177's mixed set): the
    * first half of the fixture's six — a repair that covered some token
    * ranges and not others, the state incremental repair exists for. */
  val PartialRepairedGens: Set[Long] = Set(1L, 2L, 3L)

  /** The base compressed set with ONLY [[PartialRepairedGens]] stamped —
    * the mixed repaired/unrepaired layout an incremental digest must
    * split on (session-memoized). */
  def ensureRepairedPartial(spark: SparkSession, dir: String): String =
    ensureMarked(spark, dir, "repaired-partial",
      PartialRepairedGens.contains)

  private def ensureMarked(spark: SparkSession, dir: String, tag: String,
      markGen: Long => Boolean): String = {
    val key = s"${graft.sources.PlanCache.sessionKey(spark)}|$dir|$tag"
    val slot = memo.synchronized {
      sweep()
      val hit = memo.get(key)
      if (hit != null) hit._2
      else {
        val s = new Slot(() => build(spark, dir, markGen))
        memo.put(key, (spark, s))
        s
      }
    }
    slot.value
  }

  private def build(spark: SparkSession, dir: String,
      markGen: Long => Boolean): String =
    markDir(CassandraDataFixture.ensureFiles(spark, dir,
      compressed = true), markGen)

  /** Copy an ARBITRARY sstable directory with repairedAt stamped into the
    * Statistics.db of every generation `markGen` accepts (round 14: the
    * executed-repair cycle marks its converged replicas, whatever files
    * they hold) — the same byte-exact metadata-only rewrite. */
  def markDir(inPath: String,
      markGen: Long => Boolean = _ => true): String = {
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-repaired"))
    val files = Option(new java.io.File(inPath).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.isFile)
    require(files.nonEmpty, s"no sstable files under $inPath")
    files.foreach { f =>
      val dest = out.resolve(f.getName)
      val gen = f.getName.split("-").lift(1).flatMap(_.toLongOption)
      if (f.getName.endsWith(CassandraStatsFormat.Suffix) &&
          gen.exists(markGen)) {
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val parsed = CassandraStatsFormat.parse(bytes)
        val header = CassandraStatsFormat.componentBytes(bytes,
          CassandraStatsFormat.TypeHeader)
        val o = new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(dest.toFile)))
        try CassandraStatsFormat.write(o,
          parsed.copy(stats = parsed.stats.copy(
            repairedAtMs = RepairedAtMs)), Some(header))
        finally o.close()
      } else {
        java.nio.file.Files.copy(f.toPath, dest)
        ()
      }
    }
    out.toString
  }

  /** q174: both sets through the stats source AND the full production
    * scan — one row per set. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val base = CassandraDataFixture.ensureFiles(spark, dir,
      compressed = true)
    val marked = ensureRepaired(spark, dir)
    def row(tag: String, path: String): DataFrame = {
      val stats = spark.read.format("sstable-stats")
        .option("format", "cassandra").load(path)
        .agg(count(lit(1)).as("sstables"),
          sum(when(col("is_repaired"), 1L).otherwise(0L))
            .as("repaired_sstables"),
          max("repaired_at_ms").as("repaired_at_ms"))
      val events = DataDb.cells(spark, path,
        format = DataDbScan.FormatCassandra)
        .agg(count(lit(1)).as("events"))
      stats.crossJoin(events).select(lit(tag).as("set_name"),
        col("sstables"), col("repaired_sstables"),
        col("repaired_at_ms"), col("events"))
    }
    row("base", base).unionByName(row("repaired", marked))
      .orderBy("set_name")
  }
}
