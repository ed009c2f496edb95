package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** q140: Morton bit algebra, layout-skipping stats, and the physical
  * partition-pruned read over the Z-ordered layout. */
class LayoutSpec extends SparkSpec {

  test("morton spread and interleave match hand-computed values") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L),
      (0L, 65535L), (21845L, 0L))
      .toDF("x", "y")
      .select(Layout.morton(col("x"), col("y")).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    assert(zs == Seq(0L, 1L, 2L, 15L, 0x55555555L, 0xAAAAAAAAL,
      0x11111111L))
  }

  test("q140: all 16 boxes populated; z-order touches no more files " +
    "than the linear layout overall") {
    val rows = Layout.zorderSkipping(spark, Sf0001).collect()
    assert(rows.length == 16, s"expected all 16 boxes, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("zorder_files") <= 64L)
      assert(r.getAs[Long]("linear_files") <= 64L)
      assert(r.getAs[Long]("rows_matched") > 0L)
    }
    val z = rows.map(_.getAs[Long]("zorder_files")).sum
    val l = rows.map(_.getAs[Long]("linear_files")).sum
    assert(z <= l, s"z-order read $z file-units vs linear $l")
  }

  test("physical z-ordered layout: a box reads only its covering " +
    "partitions, and they agree with the full-scan answer") {
    val out = graft.sources.TempDirs.register(
      java.nio.file.Files.createTempDirectory("graft-zorder-")).toString
    Layout.writeZordered(spark, Sf0001, out)
    // a quarter-space box in the middle of both scaled dimensions
    val (xlo, xhi) = (16384L, 32768L)
    val (ylo, yhi) = (16384L, 32768L)
    val cover = Layout.coveringBuckets(64, xlo, xhi, ylo, yhi)
    assert(cover.nonEmpty && cover.size < 64,
      s"expected a proper covering subset, got ${cover.size}")
    val pruned = spark.read.parquet(out)
      .where(col("zbucket").isin(cover: _*))
      .where(col("sx") >= xlo && col("sx") < xhi &&
        col("sy") >= ylo && col("sy") < yhi)
    // partition pruning is visible in the scan's partition filters
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(1500))
    val full = spark.read.parquet(out)
      .where(col("sx") >= xlo && col("sx") < xhi &&
        col("sy") >= ylo && col("sy") < yhi)
    assert(pruned.count() == full.count())
    // the covering set really covers: no matching row outside it
    assert(full.where(!col("zbucket").isin(cover: _*)).count() == 0)
  }
}
