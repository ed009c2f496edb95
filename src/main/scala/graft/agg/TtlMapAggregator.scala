package graft.agg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A1's TTL-histogram merge as a typed `Aggregator` (SURVEY §2.4 A1,
  * §2.10): per partition key, the reference unions TTL→count maps with
  * per-key summation as sstables collate
  * (PartitionStatistics.java:92-101, 132-138; sentinel NO_TTL = -1).
  *
  * The relational pipelines avoid carrying maps through shuffles by grouping
  * at cell level (ops/CfStats.ttlHistogram); this Aggregator is the form to
  * use when the per-partition map itself is the requested output. Merge is a
  * commutative monoid (property-tested), so partial aggregation applies and
  * partition order cannot affect results. */
object TtlMapAggregator {

  case class TtlCell(ttl_s: Long)

  class Agg extends Aggregator[TtlCell, Map[Long, Long], Map[Long, Long]] {
    def zero: Map[Long, Long] = Map.empty
    def reduce(m: Map[Long, Long], c: TtlCell): Map[Long, Long] =
      m.updated(c.ttl_s, m.getOrElse(c.ttl_s, 0L) + 1L)
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def finish(m: Map[Long, Long]): Map[Long, Long] = m
    def bufferEncoder: Encoder[Map[Long, Long]] = Encoders.kryo[Map[Long, Long]]
    def outputEncoder: Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
  }

  /** Per-partition TTL histogram of CELL events, built by the typed map
    * Aggregator and then EXPLODED to scalar rows (key, ttl_s, cnt,
    * distinct_ttls, cells): nested map/array output would defeat the
    * driver's row-hash compare, and flat rows make the query fully
    * oracle-checkable — DuckDB recomputes the same histogram relationally
    * while Spark routes it through the Aggregator's map-monoid merge, so a
    * mismatch anywhere in reduce/merge/finish surfaces as a t2 failure. */
  def perPartition(cells: DataFrame): DataFrame = {
    val histogram = udaf(new Agg(), Encoders.product[TtlCell])
    cells
      .where(col("kind") === "CELL")
      .groupBy("key")
      .agg(histogram(col("ttl_s")).as("ttl_hist"),
        count(lit(1)).as("cells"))
      .select(col("key"),
        explode(col("ttl_hist")).as(Seq("ttl_s", "cnt")),
        size(map_entries(col("ttl_hist"))).cast("long").as("distinct_ttls"),
        col("cells"))
      .select("key", "ttl_s", "cnt", "distinct_ttls", "cells")
  }
}
