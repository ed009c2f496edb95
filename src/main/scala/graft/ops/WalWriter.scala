package graft.ops

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.commitlog.CommitLogFormat
import graft.sources.commitlog.CommitLogFormat.Mutation

/** Distributed writer for WAL-format fixture files (round 17, VERDICT
  * r16 ask #7): the commitlog/hints/batchlog fixture writers used to
  * collect the full corpus to the driver and write segments
  * sequentially — at the sf1 probe that is a 10×-corpus driver collect
  * inside a benched window. File assignment is already a deterministic
  * rule (a div over a running byte sum, a coordinator map, a batch id),
  * so the write distributes: rows repartition by their target file,
  * sort within partitions by the WAL append order, and each task
  * writes the files it holds ENTIRELY — byte-identical to the
  * driver-sequential layout (same entries, same order, same codec).
  *
  * A WAL file is bounded by construction (segments cut at
  * [[CommitLogFormat.SegmentBytes]]; a hints file holds one outage
  * window; a batchlog file one batch), so buffering one file per task
  * is the same memory class the real node-local writer uses. */
object WalWriter {

  /** One WAL entry bound for a target file — field order is the append
    * order (timestamp first; the remaining fields make the order total
    * up to byte-identical duplicates). */
  final case class WalEntry(fileId: Long, timestampUs: Long, key: Long,
      clustering: Long, columnName: String, kind: String, ttlS: Long,
      localDeletionTimeS: Long, isTombstone: Boolean, isExpiring: Boolean,
      sizeBytes: Long) {
    def mutation: Mutation = Mutation(key, clustering, columnName, kind,
      timestampUs, ttlS, localDeletionTimeS, isTombstone, isExpiring,
      sizeBytes)
  }

  /** The append-order sort keys (after the file id). */
  private val AppendOrder = Seq("timestampUs", "key", "clustering",
    "columnName", "kind", "ttlS", "localDeletionTimeS", "isTombstone",
    "isExpiring", "sizeBytes")

  /** Serialized entry length — delegates to the codec's own accounting
    * ([[CommitLogFormat.entryLength]], ADVICE r17) so segment cuts can
    * never diverge from the bytes [[CommitLogFormat.writeSegment]]
    * emits. */
  def entryLength(columnName: String, kind: String): Long =
    CommitLogFormat.entryLength(columnName, kind).toLong

  /** Write one WAL file per distinct `fileId` under `out`, from
    * executors: repartition by file, sort within partitions by
    * (file, append order), roll files as the id changes. `nameOf` and
    * `segIdOf` map a file id to its file name and its on-disk segment
    * id.
    *
    * Path contract (ADVICE r17): tasks open `out` with local
    * `java.io` — correct in local mode or on a shared POSIX filesystem
    * (the fixture-staging temp dirs both Verify and Bench use), NOT on
    * object-store paths. This writer stages WAL *fixtures*; a
    * cluster-remote sink would route the same per-file byte stream
    * through the Hadoop FileSystem API instead. */
  def write(entries: Dataset[WalEntry], out: String,
      nameOf: Long => String, segIdOf: Long => Long): Unit = {
    entries
      .repartition(col("fileId"))
      .sortWithinPartitions(
        (col("fileId") +: AppendOrder.map(col)): _*)
      .foreachPartition { (it: Iterator[WalEntry]) =>
        var cur = Long.MinValue
        val buf = scala.collection.mutable.ArrayBuffer.empty[Mutation]
        def flush(): Unit = if (buf.nonEmpty) {
          val f = new java.io.File(out, nameOf(cur))
          val os = new DataOutputStream(new BufferedOutputStream(
            new FileOutputStream(f)))
          try CommitLogFormat.writeSegment(os, segIdOf(cur), buf.toSeq)
          finally os.close()
          buf.clear()
        }
        it.foreach { e =>
          if (e.fileId != cur) { flush(); cur = e.fileId }
          buf += e.mutation
        }
        flush()
      }
  }

  /** The commitlog's file rule — segment = div over the running
    * entry-byte sum in append order — as a TWO-LEVEL PREFIX SUM (the
    * scalable form of the oracle's window cumulative sum, which would
    * otherwise be one unpartitioned window): range-partition by the
    * append order, per-partition byte totals to the driver
    * (O(#partitions) rows), broadcast the partition offsets back, and
    * assign each row its exact global byte start narrowly. Duplicate
    * rows at a range boundary are byte-identical, so their partition
    * placement cannot change any cut. */
  def assignSegments(spark: SparkSession,
      rows: Dataset[WalEntry]): Dataset[WalEntry] = {
    import spark.implicits._
    val parts = math.max(1,
      spark.sparkContext.defaultParallelism)
    val sorted = rows
      .repartitionByRange(parts, AppendOrder.map(col): _*)
      .sortWithinPartitions(AppendOrder.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sums = sorted.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        it.foreach(e => s += entryLength(e.columnName, e.kind))
        Iterator((pid, s))
      }.collect().toMap
      val nParts = sums.keys.maxOption.map(_ + 1).getOrElse(0)
      val offsets = (0 until nParts)
        .scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L))
      val bc = spark.sparkContext.broadcast(offsets.toArray)
      sorted.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var cum = bc.value(pid)
        it.map { e =>
          val seg = cum / CommitLogFormat.SegmentBytes
          cum += entryLength(e.columnName, e.kind)
          e.copy(fileId = seg)
        }
      }.localCheckpoint(eager = true)
    } finally {
      sorted.unpersist()
      ()
    }
  }
}
