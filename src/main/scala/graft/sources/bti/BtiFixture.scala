package graft.sources.bti

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** Materializes the SAME logical partition index as
  * [[graft.sources.indexdb.IndexDbFixture]] (lineitem pscan: 8-byte
  * big-endian long keys, position = running size sum in key order) as bti
  * Partitions.db tries — so a bti scan and the big-format Index.db scan
  * must produce identical relations, which is exactly what q101 pins.
  * Memoization/cleanup contract mirrors the other fixture writers. */
object BtiFixture {

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
      Files.createTempDirectory("graft-bti-fixture"))
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
    var entries = Vector.empty[(Array[Byte], Long)]
    var position = 0L
    def flush(): Unit = if (current != null) {
      Files.write(out.resolve(current + BtiTrieFormat.Suffix),
        BtiTrieFormat.write(entries.iterator))
      entries = Vector.empty
    }
    rows.foreach { r =>
      val sst = r.getString(0)
      if (sst != current) {
        flush()
        current = sst
        position = 0L
      }
      entries :+= ((java.nio.ByteBuffer.allocate(8)
        .putLong(r.getLong(1)).array(), position))
      position += r.getLong(2)
    }
    flush()
  }
}
