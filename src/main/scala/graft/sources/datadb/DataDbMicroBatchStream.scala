package graft.sources.datadb

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming ingest of a live SSTable directory: each micro-batch processes
  * the Data.db files that APPEARED since the last committed offset.
  *
  * SSTables are immutable once flushed (Cassandra never rewrites a live
  * one), so "new file in the directory" is an exactly-once streaming unit:
  * an offset is simply the set of file names already processed. This is the
  * Spark-streaming analog of re-running a reference command against each
  * newer snapshot — `readStream.format("sstable-data")` + a watermarked
  * aggregation gives a continuously-maintained cfstats.
  *
  * Offsets serialize the sorted seen-file list as JSON. At fixture scale
  * the list is tiny; a production deployment would compact it to the
  * max generation id per table (Cassandra's sstable names carry a
  * monotonically increasing generation), keeping offsets O(1).
  *
  * Large arrivals still split at partition boundaries via the Index.db
  * sidecar (DataDbScan.splitsOf) and are read through the same vectorized
  * reader factory as the batch path. */
final class DataDbMicroBatchStream(path: String, required: StructType,
    maxSplitBytes: Long, confEntries: Array[(String, String)],
    format: String = DataDbScan.FormatGraft)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def conf(): Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def listFiles(): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    if (!fs.exists(p)) return Nil
    val status = fs.getFileStatus(p)
    val files =
      if (status.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile &&
            s.getPath.getName.endsWith(DataDbFormat.Suffix))
          .map(_.getPath.getName)
      else Seq(status.getPath.getName)
    files.sorted
  }

  override def initialOffset(): Offset = graft.sources.FileSetOffset(Nil)

  /** Trigger.AvailableNow: the directory is snapshotted ONCE at query start
    * and every batch runs against that frozen target — files arriving
    * mid-drain wait for the next run (the contract prepareForTriggerAvailableNow
    * documents). */
  private var availableNowTarget: Option[Offset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(graft.sources.FileSetOffset(listFiles()))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.getOrElse(graft.sources.FileSetOffset(listFiles()))

  override def deserializeOffset(json: String): Offset =
    graft.sources.FileSetOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[graft.sources.FileSetOffset].files.toSet
    val fresh = end.asInstanceOf[graft.sources.FileSetOffset].files.filterNot(seen)
    val p = new Path(path)
    val fs = p.getFileSystem(conf())
    fresh.flatMap { name =>
      val file = new Path(p, name)
      val id = name.stripSuffix(DataDbFormat.Suffix)
      val len = fs.getFileStatus(file).getLen
      DataDbScan.splitsOf(fs, file, id, len, maxSplitBytes, format)
        .map(sp => sp: InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DataDbReaderFactory(required, confEntries, format)

  override def stop(): Unit = ()
}
