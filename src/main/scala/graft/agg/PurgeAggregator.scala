package graft.agg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A12: the purge "fake compaction" as a typed Aggregator[IN, BUF, OUT]
  * (SURVEY §2.4 A12, PurgeStatisticBackend.java:70-257).
  *
  * Single-shuffle alternative to graft.ops.Purge's window formulation: cells
  * hash-shuffle once on the partition key; the buffer carries per-(clustering,
  * column) LWW winners, merged associatively — Cassandra's
  * `UnfilteredRowIterators.merge` last-write-wins reconciliation (:129) as a
  * semigroup fold, with the same (timestamp, sstable, size, tombstone, ldt)
  * tiebreak chain as the window form so both give identical results.
  * The purge predicate (F7: localDeletionTime < gcBefore,
  * DeletionPurger :206-209) is applied in finish().
  *
  * Scale: buffer size is O(distinct cells per partition), the same bound the
  * reference holds per merged partition; partial aggregation runs map-side so
  * shuffled bytes are reconciled buffers, not raw cells. */
object PurgeAggregator {

  case class Cell(key: Long, clustering: Long,
      column_name: String, sstable_id: String, timestamp_us: Long,
      local_deletion_time_s: Long, is_tombstone: Boolean, size_bytes: Long)

  case class Winner(timestamp_us: Long, sstable_id: String,
      size_bytes: Long, is_tombstone: Boolean, local_deletion_time_s: Long)

  /** Mutable accumulation state (kryo-encoded: buffers live as objects
    * within a partition and only serialize at the exchange, so per-cell
    * updates must not churn persistent structures — immutable Map.updated
    * per row was the dominant cost of this Aggregator). */
  case class Buf(var size: Long,
      tables: scala.collection.mutable.HashSet[String],
      winners: scala.collection.mutable.HashMap[(Long, String), Winner])

  case class Result(table_count: Long, size: Long, merged_size: Long,
      reclaimable: Long)

  /** Same total order as the window form's orderBy — later wins. */
  private def beats(a: Winner, b: Winner): Boolean = {
    if (a.timestamp_us != b.timestamp_us) a.timestamp_us > b.timestamp_us
    else if (a.sstable_id != b.sstable_id) a.sstable_id > b.sstable_id
    else if (a.size_bytes != b.size_bytes) a.size_bytes > b.size_bytes
    else if (a.is_tombstone != b.is_tombstone) a.is_tombstone
    else a.local_deletion_time_s > b.local_deletion_time_s
  }

  class Agg(gcBeforeS: Long) extends Aggregator[Cell, Buf, Result] {
    def zero: Buf = Buf(0L,
      scala.collection.mutable.HashSet.empty,
      scala.collection.mutable.HashMap.empty)

    def reduce(b: Buf, c: Cell): Buf = {
      val ck = (c.clustering, c.column_name)
      val w = Winner(c.timestamp_us, c.sstable_id, c.size_bytes,
        c.is_tombstone, c.local_deletion_time_s)
      b.winners.get(ck) match {
        case Some(prev) if !beats(w, prev) => ()
        case _ => b.winners.update(ck, w)
      }
      b.size += c.size_bytes
      b.tables += c.sstable_id
      b
    }

    def merge(x: Buf, y: Buf): Buf = {
      y.winners.foreach { case (ck, w) =>
        x.winners.get(ck) match {
          case Some(prev) if !beats(w, prev) => ()
          case _ => x.winners.update(ck, w)
        }
      }
      x.size += y.size
      x.tables ++= y.tables
      x
    }

    def finish(b: Buf): Result = {
      val merged = b.winners.valuesIterator
        .filterNot(w => w.is_tombstone && w.local_deletion_time_s < gcBeforeS)
        .map(_.size_bytes).sum
      Result(b.tables.size.toLong, b.size, merged, b.size - merged)
    }

    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** cells → per-key purge stats; one shuffle on `key`. */
  def perPartition(cells: DataFrame, gcBeforeS: Long): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .select("key", "clustering", "column_name",
        "sstable_id", "timestamp_us", "local_deletion_time_s",
        "is_tombstone", "size_bytes")
      .as[Cell]
      .groupByKey(_.key)
      .agg(new Agg(gcBeforeS).toColumn.name("purge"))
      .select(col("key"),
        concat(lit("key-"), col("key")).as("key_formatted"),
        col("purge.table_count").as("table_count"),
        col("purge.size").as("size"),
        col("purge.merged_size").as("merged_size"),
        col("purge.reclaimable").as("reclaimable"))
  }
}
