package graft.sources.indexdb

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

import graft.sources.FileSetOffset

/** Streaming ingest of a live SSTable directory's partition indexes: each
  * micro-batch reads the Index.db files that APPEARED since the committed
  * offset — the Data.db stream's sibling (see DataDbMicroBatchStream for
  * the immutable-file-arrival rationale), enabling a continuously
  * maintained pstats without ever touching data files. */
final class IndexDbMicroBatchStream(path: String, required: StructType,
    confEntries: Array[(String, String)])
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
            s.getPath.getName.endsWith(IndexDbFormat.Suffix))
          .map(_.getPath.getName)
      else Seq(status.getPath.getName)
    files.sorted
  }

  override def initialOffset(): Offset = FileSetOffset(Nil)

  private var availableNowTarget: Option[Offset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(FileSetOffset(listFiles()))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.getOrElse(FileSetOffset(listFiles()))

  override def deserializeOffset(json: String): Offset =
    FileSetOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FileSetOffset].files.toSet
    val fresh = end.asInstanceOf[FileSetOffset].files.filterNot(seen)
    val p = new Path(path)
    fresh.map { name =>
      IndexDbInputPartition(new Path(p, name).toString,
        name.stripSuffix(IndexDbFormat.Suffix)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IndexDbReaderFactory(required, confEntries)

  override def stop(): Unit = ()
}
