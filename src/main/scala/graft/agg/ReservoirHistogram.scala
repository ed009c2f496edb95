package graft.agg

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A3/A4: the reference's bounded-memory distribution estimator as a typed
  * aggregate — Vitter Algorithm R reservoir (size 1028, Histogram.java:12)
  * with exact running min/max/total/count beside the sample
  * (Histogram.java:57-74), and R-6 percentiles (pos = p·(n+1), linear
  * interpolation clamped to the ends — Snapshot.java:85-108, the Weibull
  * plotting position, deliberately different from Spark/DuckDB's R-7).
  *
  * The default report pipelines use exact percentiles (SURVEY §2.4 A4
  * recommendation: exact + documented tolerance) — this aggregator is the
  * reference-parity estimator and the bounded-memory path for data too hot
  * for an exact sort: O(1028) per group regardless of input size.
  *
  * Reference quirks kept deliberately: mean = exactTotal/exactCount
  * (Snapshot.java:66-68) while stddev is the sample stddev over the
  * reservoir only (:115-129); max is exact but initialized to 0
  * (Histogram.java:32-37), so all-negative inputs report max 0.
  *
  * Determinism: the reference uses ThreadLocalRandom (non-reproducible run
  * to run); we seed the RNG from the running element count, making each
  * partition's fold deterministic. Cross-partition merge concatenates and
  * deterministically downsamples. Estimates carry sampling error either way
  * — tests assert tolerance vs exact, not bit equality. */
object ReservoirHistogram {

  val DefaultSize = 1028

  case class Buf(count: Long, total: Long, min: Long, max: Long,
      sample: Vector[Long])

  case class Snap(count: Long, total: Long, min: Long, max: Long,
      mean: Double, stddev: Double, p50: Double, p75: Double, p90: Double,
      p95: Double, p99: Double)

  /** R-6 percentile over a sorted sample: pos = p·(n+1), linear
    * interpolation, clamped (Snapshot.java:85-108). */
  def percentileR6(sorted: IndexedSeq[Long], p: Double): Double = {
    val n = sorted.length
    if (n == 0) return 0.0
    val pos = p * (n + 1)
    if (pos < 1) sorted.head.toDouble
    else if (pos >= n) sorted.last.toDouble
    else {
      val lower = sorted(pos.toInt - 1)
      val upper = sorted(pos.toInt)
      lower + (pos - math.floor(pos)) * (upper - lower)
    }
  }

  class Agg(reservoirSize: Int = DefaultSize)
      extends Aggregator[Long, Buf, Snap] {

    // exact max initialized to 0, exact min to MaxValue (Histogram.java:32-37)
    def zero: Buf = Buf(0L, 0L, Long.MaxValue, 0L, Vector.empty)

    def reduce(b: Buf, v: Long): Buf = {
      val count = b.count + 1
      val sample =
        if (b.sample.length < reservoirSize) b.sample :+ v
        else {
          // Algorithm R, RNG seeded by running count for reproducibility
          val r = new Random(count).nextLong().abs % count
          if (r < reservoirSize) b.sample.updated(r.toInt, v) else b.sample
        }
      Buf(count, b.total + v, math.min(b.min, v), math.max(b.max, v), sample)
    }

    def merge(x: Buf, y: Buf): Buf = {
      val combined = x.sample ++ y.sample
      val sample =
        if (combined.length <= reservoirSize) combined
        else {
          // deterministic proportional downsample: take every k-th element
          val step = combined.length.toDouble / reservoirSize
          Vector.tabulate(reservoirSize)(i => combined((i * step).toInt))
        }
      Buf(x.count + y.count, x.total + y.total, math.min(x.min, y.min),
        math.max(x.max, y.max), sample)
    }

    def finish(b: Buf): Snap = {
      val sorted = b.sample.sorted
      val n = sorted.length
      val mean = if (b.count == 0) 0.0 else b.total.toDouble / b.count
      // Snapshot.getStdDev (:115-129): the squared deviations sum over the
      // RESERVOIR values but center on the EXACT mean (total/count), divided
      // by (reservoirSize - 1) — the reference's mixed exact/sampled quirk,
      // mirrored verbatim.
      val stddev =
        if (n <= 1) 0.0
        else math.sqrt(sorted.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      Snap(b.count, b.total, if (b.count == 0) 0L else b.min, b.max, mean,
        stddev,
        percentileR6(sorted, 0.50), percentileR6(sorted, 0.75),
        percentileR6(sorted, 0.90), percentileR6(sorted, 0.95),
        percentileR6(sorted, 0.99))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Snap] = Encoders.product[Snap]
  }

  /** DETERMINISTIC replay mode (q42c, VERDICT r8 ask #7): the identical
    * Vitter-R fold run as ONE totally-ordered sequence — repartition(1) +
    * an explicit in-partition sort on a unique key, folded imperatively in
    * `mapPartitions` so no optimizer rule (EliminateSorts treats aggregates
    * as order-agnostic) can silently drop the ordering the replay depends
    * on. Because each step's seed is the running count and Algorithm R's
    * slot choice `r_i = |Random(i).nextLong()| % i` depends only on `i`,
    * the final reservoir has a closed relational form — slot s holds the
    * value of the LAST i with r_i = s (or the initial fill v_{s+1}) — which
    * the DuckDB oracle replays exactly, Java LCG arithmetic included, so
    * the sampled percentiles themselves become hash-checkable.
    *
    * Single-partition by construction: this is the estimator-parity proof
    * at a bounded sample size, not the production scale path (q01's exact
    * percentiles and the default `snapshot` cover those). */
  def snapshotSeeded(df: DataFrame, column: String, orderCol: String,
      reservoirSize: Int = DefaultSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new Agg(reservoirSize)
    df.select(col(orderCol).cast("long").as("ord"),
        col(column).cast("long").as("v"))
      .repartition(1)
      .sortWithinPartitions("ord")
      .as[(Long, Long)]
      .mapPartitions { it =>
        var b = agg.zero
        it.foreach { case (_, v) => b = agg.reduce(b, v) }
        Iterator.single(agg.finish(b))
      }
      .toDF()
  }

  /** Distribution snapshot of one long column, reservoir-estimated. */
  def snapshot(df: DataFrame, column: String,
      reservoirSize: Int = DefaultSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("long")).as[Long]
      .select(new Agg(reservoirSize).toColumn)
      .map(identity) // re-encode so the Snap fields become top-level columns
      .toDF()
  }
}
