package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.{Fixtures, Tables}

/** Report-pipeline specs over the sf0.001 fixtures. */
class ReportsSpec extends SparkSpec {

  test("pstats size distribution has sane exact stats") {
    val row = PStats.sizeDistribution(spark, Sf0001).collect().head
    val n = row.getAs[Long]("size_n")
    assert(n > 0)
    assert(row.getAs[Long]("size_min") <= row.getAs[Long]("size_p50"))
    assert(row.getAs[Long]("size_p50") <= row.getAs[Long]("size_p99"))
    assert(row.getAs[Long]("size_p99") <= row.getAs[Long]("size_max"))
    assert(row.getAs[Long]("size_avg") >= row.getAs[Long]("size_min"))
    assert(row.getAs[Long]("table_count_max") <= 6)
  }

  test("top-N by size equals sort+limit semantics and is size-descending") {
    val rows = PStats.topBySize(spark, Sf0001, 10).collect()
    assert(rows.length == 10)
    val sizes = rows.map(_.getAs[Long]("size"))
    assert(sizes.sameElements(sizes.sortBy(-_)))
  }

  test("collate: partition table_count matches distinct sstables per key") {
    val cells = Fixtures.lineitemCells(Tables.lineitem(spark, Sf0001))
    val direct = cells.groupBy("key")
      .agg(countDistinct("sstable_id").as("tc"))
    val collated = Fixtures.partitions(Fixtures.partitionScan(cells))
      .select(col("key"), col("table_count"))
    val joined = direct.join(collated, "key")
      .where(col("tc") =!= col("table_count"))
    assert(joined.count() == 0)
  }

  test("summary rollup: repaired subset bounds and repair pct") {
    val rows = Summary.rollup(spark, Sf0001).collect()
    assert(rows.length == 2) // ks1.lineitem + ks1.orders
    rows.foreach { r =>
      assert(r.getAs[Long]("repaired_count") <= r.getAs[Long]("sstable_count"))
      assert(r.getAs[Long]("repaired_length") <=
        r.getAs[Long]("uncompressed_length"))
      val pct = r.getAs[Long]("repair_pct")
      assert(pct >= 0 && pct <= 100)
    }
  }

  test("cfstats totals are consistent with sstable-level stats") {
    val totals = CfStats.totals(spark, Sf0001).collect().head
    val perSst = CfStats.sstableStats(spark, Sf0001)
      .agg(sum("tombstone_count"), sum("cell_count")).collect().head
    assert(totals.getAs[Long]("tombstone_count") == perSst.getLong(0))
    assert(totals.getAs[Long]("cell_count") == perSst.getLong(1))
  }

  test("ttl histogram includes NO_TTL sentinel and positive counts") {
    val rows = CfStats.ttlHistogram(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("ttl_s")).contains(-1L))
    assert(rows.forall(_.getAs[Long]("cell_count") > 0))
  }

  test("index offsets: lead(position)-position always re-derives size") {
    val rows = PStats.indexOffsets(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mismatches") == 0)
      assert(r.getAs[Long]("derived_total") == r.getAs[Long]("stored_total"))
    }
  }

  test("driver contract: entry() returns rows on sf0.001, every query runs") {
    assert(SparkEntry.entry(spark).count() > 0)
    // oracleSql keys must be a subset of queries (driver joins on name)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("salted partition scan == plain partition scan (skew-split exactness)") {
    val cells = Fixtures.cells(spark, Sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    }
    assert(canon(Fixtures.partitionScanSalted(cells, buckets = 7)) ===
      canon(Fixtures.partitionScan(cells)))
  }

  test("purge invariants: 0 <= reclaimable <= size; gc=-inf purges nothing") {
    val cells = Fixtures.lineitemCells(Tables.lineitem(spark, Sf0001))
    val stats = Purge.perPartition(cells).collect()
    stats.foreach { r =>
      val size = r.getAs[Long]("size")
      val rec = r.getAs[Long]("reclaimable")
      assert(rec >= 0 && rec <= size)
    }
    // with gcBefore = Long.MinValue nothing is droppable: reclaimable comes
    // only from shadowed duplicates, so merged == winners' sizes
    val agg = graft.agg.PurgeAggregator.perPartition(cells, Long.MinValue)
    val bad = agg.where(col("merged_size") > col("size"))
    assert(bad.count() == 0)
  }

  test("purge window form == purge Aggregator form") {
    val cells = Fixtures.lineitemCells(Tables.lineitem(spark, Sf0001))
    val w = Purge.perPartition(cells)
      .select("key", "table_count", "size", "reclaimable")
    val a = graft.agg.PurgeAggregator
      .perPartition(cells, Fixtures.GcBeforeS)
      .select("key", "table_count", "size", "reclaimable")
    assert(w.exceptAll(a).count() == 0)
    assert(a.exceptAll(w).count() == 0)
  }
}
