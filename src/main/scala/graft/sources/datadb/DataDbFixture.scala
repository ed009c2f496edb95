package graft.sources.datadb

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** Materializes the lineitem cell-event fixture as REAL binary Data.db
  * files (DataDbFormat), so the DataSource V2 path is exercised — and
  * oracle-checked — end to end: parquet cells → binary encode → file →
  * DSv2 parse → relational aggregate must equal the DuckDB recomputation
  * from the same parquet inputs.
  *
  * Partition blocks are written in ascending (key) order per sstable with
  * events ordered by (clustering, column_name, timestamp_us) inside each
  * block — SSTables are key-sorted on disk, which the reference's k-way
  * merge relies on (AbstractSSTableReader.java:28-30); our reader does not
  * need the sortedness, but the files should look like what Cassandra
  * writes. Driver-side sequential writes are fine here: this is fixture
  * generation (the real deployment reads files Cassandra already wrote),
  * not query execution. */
object DataDbFixture {

  private val memo = new java.util.HashMap[String, (SparkSession, String)]()

  /** Drop entries of stopped sessions and delete their temp trees — keyed by
    * sessionUUID (identity hash codes can collide across session lifetimes
    * in one JVM and would serve a dead session's path to a new session). */
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
      Files.createTempDirectory("graft-datadb-fixture"))
    // a half-written tree is never memoized NOR left behind: delete on failure
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

  /** Each Data.db gets a companion Index.db sidecar whose positions are the
    * REAL byte offsets of the partition blocks (what Cassandra's partition
    * index stores) — the DSv2 scan splits large files at those offsets. */
  private def writeAll(spark: SparkSession, dir: String, out: Path): Unit = {
    val rows = Fixtures.cells(spark, dir)
      .select(col("sstable_id"), col("key"), col("clustering"),
        col("column_name"), col("kind"), col("timestamp_us"), col("ttl_s"),
        col("local_deletion_time_s"), col("is_tombstone"), col("is_expiring"),
        col("is_counter"), col("is_live"), col("size_bytes"))
      .orderBy("sstable_id", "key", "clustering", "column_name", "timestamp_us")
      .collect()
    var currentSst: String = null
    var currentKey: Long = Long.MinValue
    var inPartition = false
    var stream: DataOutputStream = null
    var index: DataOutputStream = null

    def closeStreams(): Unit = {
      if (stream != null) {
        if (inPartition) DataDbFormat.writePartitionEnd(stream)
        stream.close()
        index.close()
      }
    }

    // on any mid-write throw the open streams must not leak (the caller
    // deletes the half-written tree, which needs the handles closed first)
    try {
      rows.foreach { r =>
        val sst = r.getString(0)
        val key = r.getLong(1)
        if (sst != currentSst) {
          closeStreams()
          stream = new DataOutputStream(new BufferedOutputStream(
            new FileOutputStream(out.resolve(sst + DataDbFormat.Suffix).toFile)))
          index = new DataOutputStream(new BufferedOutputStream(
            new FileOutputStream(out.resolve(
              sst + graft.sources.indexdb.IndexDbFormat.Suffix).toFile)))
          currentSst = sst
          inPartition = false
        }
        if (!inPartition || key != currentKey) {
          if (inPartition) DataDbFormat.writePartitionEnd(stream)
          val keyBytes = java.nio.ByteBuffer.allocate(8).putLong(key).array()
          // DataOutputStream.size() is the block's byte offset (int-sized is
          // fine for fixtures; real files would track a long)
          graft.sources.indexdb.IndexDbFormat.writeEntry(index, keyBytes,
            stream.size().toLong)
          DataDbFormat.writePartitionHeader(stream, keyBytes)
          currentKey = key
          inPartition = true
        }
        DataDbFormat.writeEvent(stream, DataDbFormat.Event(
          key = null, // the block header carries the key
          clustering = r.getLong(2),
          columnNameBytes = r.getString(3)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          kindCode = DataDbFormat.KindStrings.indexOf(r.getString(4)),
          flags = DataDbFormat.flagsOf(r.getBoolean(8), r.getBoolean(9),
            r.getBoolean(10), r.getBoolean(11)),
          timestampUs = r.getLong(5),
          ttlS = r.getLong(6),
          localDeletionTimeS = r.getLong(7),
          sizeBytes = r.getLong(12)))
      }
    } finally closeStreams()
  }
}
