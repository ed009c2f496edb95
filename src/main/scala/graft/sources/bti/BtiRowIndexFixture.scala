package graft.sources.bti

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** Materializes the lineitem partition index as FULL bti sstable sets —
  * `X-Partitions.db` AND `X-Rows.db` — with the real large-partition
  * shape: partitions wider than [[BlockBytes]] get a row-index trie in
  * Rows.db (separator = 8-byte big-endian block ordinal, block offsets
  * ascending multiples of [[BlockBytes]] within the partition) and their
  * Partitions.db payload stores `~entryOffset`; small partitions store the
  * direct Data.db position. Positions are the same running size sum in key
  * order as [[BtiFixture]] / IndexDbFixture, so every derived value is
  * oracle-recomputable from parquet (blocks = ceil(size / BlockBytes)).
  * Memoization/cleanup contract mirrors the other fixture writers. */
object BtiRowIndexFixture {

  /** Row-index granularity: a partition larger than this gets indexed.
    * (Cassandra's column_index_size_in_kb analog, fixed for determinism.) */
  val BlockBytes = 4096L

  private val memo = new java.util.HashMap[String, (SparkSession, String)]()

  private def sweepStopped(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue._1.sparkContext.isStopped) {
        val root = new java.io.File(e.getValue._2)
        Option(root.listFiles()).foreach(_.foreach(_.delete()))
        root.delete()
        it.remove()
      }
    }
  }

  def ensureFiles(spark: SparkSession, dir: String): String = memo.synchronized {
    sweepStopped()
    val k = s"${graft.sources.PlanCache.sessionKey(spark)}|$dir"
    val hit = memo.get(k)
    if (hit != null) return hit._2
    val out = graft.sources.TempDirs.register(
      Files.createTempDirectory("graft-bti-rowindex-fixture"))
    try writeAll(spark, dir, out)
    catch {
      case t: Throwable =>
        val root = out.toFile
        Option(root.listFiles()).foreach(_.foreach(_.delete()))
        root.delete()
        throw t
    }
    val path = out.toString
    memo.put(k, (spark, path))
    path
  }

  private def writeAll(spark: SparkSession, dir: String, out: Path): Unit = {
    val rows = Fixtures.liPscan(spark, dir)
      .select(col("sstable_id"), col("key"), col("size"))
      .orderBy("sstable_id", "key")
      .collect()
    var current: String = null
    var entries = Vector.empty[(Array[Byte], Long)] // (key, payload pos)
    var rowsWriter: BtiRowsFormat.Writer = null
    var position = 0L
    def be8(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def flush(): Unit = if (current != null) {
      Files.write(out.resolve(current + BtiTrieFormat.Suffix),
        BtiTrieFormat.write(entries.iterator))
      Files.write(out.resolve(current + BtiRowsFormat.Suffix),
        rowsWriter.finish())
      entries = Vector.empty
    }
    rows.foreach { r =>
      val sst = r.getString(0)
      if (sst != current) {
        flush()
        current = sst
        rowsWriter = new BtiRowsFormat.Writer
        position = 0L
      }
      val size = r.getLong(2)
      val nblocks = (size + BlockBytes - 1) / BlockBytes
      val pos =
        if (nblocks > 1) {
          val blocks = (0L until nblocks)
            .map(b => (be8(b), b * BlockBytes))
          ~rowsWriter.append(blocks, position)
        } else position
      entries :+= ((be8(r.getLong(1)), pos))
      position += size
    }
    flush()
  }
}
