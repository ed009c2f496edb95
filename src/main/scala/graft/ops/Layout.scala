package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-dimensional data LAYOUT for scan locality — the Z-order
  * (Morton-curve) clustering trick a 100 TB table uses so that 2-D box
  * predicates (user range × time range) touch few files instead of all of
  * them. Row-linear layouts cluster one dimension perfectly and scatter
  * every other; interleaving the dimensions' bits gives every dimension
  * half its locality, which turns an O(all files) scan into O(√files) for
  * square boxes (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER shape).
  *
  * Everything here is exact integer bit algebra (the classic
  * magic-number bit spread), inside whole-stage codegen on the Spark side
  * and replayed with the same `&`/`|`/`<<` operators by the DuckDB
  * oracle. */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30) —
    * the Morton interleave half-step, as a codegen'd Column expression. */
  def spread16(c: Column): Column = {
    val m0 = lit(0x0000FFFFL); val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL); val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val x0 = c.bitwiseAND(m0)
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(m1)
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(m2)
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(m3)
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(m4)
  }

  /** 32-bit Morton code of two 16-bit coordinates: bit 2i = x_i,
    * bit 2i+1 = y_i. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Size-gated driver scalars: the occupied coordinate ranges the
    * scaling derives from (one 1-row aggregate action — the "analyze"
    * step of an OPTIMIZE ZORDER run). */
  private[graft] def coordRange(spark: SparkSession, dir: String)
      : (Long, Long, Long, Long) = {
    val r = Tables.events(spark, dir)
      .select(col("user_id").as("ux"),
        expr("unix_micros(ts) div 3600000000").as("uy"))
      .agg(min("ux"), max("ux"), min("uy"), max("uy")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** The events relation lifted to LAYOUT coordinates: x = user id and
    * y = hour index, each affinely scaled from its occupied [min, max]
    * range onto the full 16-bit space (so the curve's resolution tracks
    * the data, not the raw id domain), plus the two competing bucket
    * assignments at `buckets` files each — Z-order buckets are the top
    * log2(buckets) Morton bits; the row-linear control is the equi-width
    * time sort into the same number of buckets. */
  private def coords(spark: SparkSession, dir: String, buckets: Int,
      r: (Long, Long, Long, Long)): DataFrame = {
    val (umin, umax, hmin, hmax) = r
    val (spanX, spanY) = (umax - umin + 1, hmax - hmin + 1)
    val shift = 32 - Integer.numberOfTrailingZeros(buckets)
    Tables.events(spark, dir)
      .select(col("event_id"),
        expr(s"(user_id - ${umin}L) * 65536 div ${spanX}L").as("sx"),
        expr(s"(unix_micros(ts) div 3600000000 - ${hmin}L) * 65536" +
          s" div ${spanY}L").as("sy"))
      .withColumn("zkey", morton(col("sx"), col("sy")))
      .withColumn("zbucket", shiftright(col("zkey"), shift))
      .withColumn("lbucket", expr(s"sy * $buckets div 65536"))
  }

  /** q140: LAYOUT SKIPPING stats — 16 fixed query boxes (a diagonal and
    * an anti-diagonal sweep of 8192×8192 cells in the scaled space)
    * evaluated against both layouts. Per box: matching rows, and how
    * many of the `buckets` files each layout would have to read
    * (`countDistinct(bucket)` over the matches — exactly the file-skip
    * count a min/max index achieves, since each bucket holds a
    * contiguous key range). Z-order touches O(1) cells per square box;
    * the row-linear control reads its full time slice across every user
    * — the measured gap IS the layout's value, oracle-checked.
    *
    * Scale shape: one narrow pass computes both bucket ids and the
    * matched-box list per row (`filter` over a 16-element literal struct
    * array — no join, no row blow-up beyond actual matches), then a
    * 16-group aggregate. */
  def zorderSkipping(spark: SparkSession, dir: String,
      buckets: Int = 64): DataFrame = {
    require((buckets & (buckets - 1)) == 0, "buckets must be a power of 2")
    val cell = 65536L / 8
    val boxes = (0 until 8).map { i =>
      (i.toLong, i * cell, (i + 1) * cell, i * cell, (i + 1) * cell)
    } ++ (0 until 8).map { j =>
      (8L + j, j * cell, (j + 1) * cell, (7 - j) * cell, (8 - j) * cell)
    }
    val boxArr = array(boxes.map { case (id, xlo, xhi, ylo, yhi) =>
      struct(lit(id).as("box_id"), lit(xlo).as("xlo"), lit(xhi).as("xhi"),
        lit(ylo).as("ylo"), lit(yhi).as("yhi"))
    }: _*)
    coords(spark, dir, buckets, coordRange(spark, dir))
      .withColumn("hit", explode(filter(boxArr, b =>
        col("sx") >= b.getField("xlo") && col("sx") < b.getField("xhi") &&
          col("sy") >= b.getField("ylo") && col("sy") < b.getField("yhi"))))
      .groupBy(col("hit.box_id").as("box_id"))
      .agg(count(lit(1)).as("rows_matched"),
        countDistinct(col("zbucket")).as("zorder_files"),
        countDistinct(col("lbucket")).as("linear_files"))
      .orderBy("box_id")
  }

  /** The Z-ordered physical layout itself: events written as parquet
    * hive-partitioned by zbucket (the file-per-bucket contract the stats
    * above count). [[coveringBuckets]] computes the planner-side
    * partition filter for a box in the scaled space. */
  def writeZordered(spark: SparkSession, dir: String, out: String,
      buckets: Int = 64): Unit =
    coords(spark, dir, buckets, coordRange(spark, dir))
      .repartition(col("zbucket"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(out)

  /** Driver-side covering set: the Z buckets whose Morton cell overlaps
    * the box — bucket b (top-2k Morton bits) is the grid cell
    * (x cell = even bits of b, y cell = odd bits). O(buckets) work. */
  def coveringBuckets(buckets: Int, xlo: Long, xhi: Long, ylo: Long,
      yhi: Long): Seq[Long] = {
    val bits = Integer.numberOfTrailingZeros(buckets) / 2 // per dimension
    val cell = 65536L >> bits
    (0L until buckets.toLong).filter { b =>
      var xb = 0L; var yb = 0L
      (0 until bits).foreach { i =>
        xb |= ((b >> (2 * i)) & 1L) << i
        yb |= ((b >> (2 * i + 1)) & 1L) << i
      }
      val (cx0, cx1) = (xb * cell, (xb + 1) * cell)
      val (cy0, cy1) = (yb * cell, (yb + 1) * cell)
      cx0 < xhi && xlo < cx1 && cy0 < yhi && ylo < cy1
    }
  }
}
