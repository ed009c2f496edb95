package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-report aggregate block (SURVEY §2.4 A3–A6): Count / Total /
  * Min / Max / Avg / StdDev / p50 / p75 / p90 / p95 / p99 over one measure.
  *
  * The reference estimates these from a 1028-element reservoir
  * (Histogram.java, Snapshot.java:85-129); we compute them exactly — Spark's
  * `percentile` is an exact sort-based aggregate and avg/stddev are derived
  * from exact integer sums (decimal accumulation), which keeps results
  * bit-identical across engines and across partition orderings. At real
  * 100 TB scale swap `percentile` for `percentile_approx` (same plan shape,
  * bounded memory); the exact form is the oracle-checked default.
  */
object Dist {
  private val Ps = Seq("50" -> 0.50, "75" -> 0.75, "90" -> 0.90,
    "95" -> 0.95, "99" -> 0.99)

  /** Aggregate columns for measure `c`. All outputs are BIGINT: averages are
    * floor(total/count) (integer division, matching the reference's A14),
    * stddev is floor of the sample stddev computed from exact Σx / Σx²
    * (order-independent), percentiles are floored interpolated values.
    *
    * All five percentiles come from ONE `percentile(c, array(...))`
    * aggregate (a single sort buffer) rather than five separate ones — the
    * buffer holds each group's values once instead of five times, which is
    * the difference between spilling and not at scale. The array is expanded
    * by [[expand]]; the driver's result compare is column-name keyed, so
    * the reshuffled projection order is immaterial. */
  def agg(c: String): Seq[Column] = {
    val n = count(lit(1))
    val nd = n.cast("decimal(38,0)")
    val sx = sum(col(c).cast("decimal(38,0)"))
    val sx2 = sum((col(c) * col(c)).cast("decimal(38,0)"))
    val variance = (sx2 * nd - sx * sx).cast("double") /
      (nd * (nd - lit(1))).cast("double")
    Seq(
      n.as(s"${c}_n"),
      sum(col(c)).as(s"${c}_total"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max"),
      floor(sum(col(c)) / n).as(s"${c}_avg"),
      floor(sqrt(variance)).as(s"${c}_std"),
      expr(s"percentile($c, array(${Ps.map(_._2).mkString(", ")}))")
        .as(s"__pcts_$c"))
  }

  /** Expand the packed percentile array of [[agg]] into the named `_pNN`
    * columns (call after the aggregation). */
  def expand(df: DataFrame, c: String): DataFrame = {
    val others = df.columns.filterNot(_ == s"__pcts_$c").map(col).toSeq
    df.select(others ++ Ps.zipWithIndex.map { case ((nm, _), i) =>
      floor(element_at(col(s"__pcts_$c"), i + 1)).as(s"${c}_p$nm")
    }: _*)
  }

  /** DuckDB SQL projection equivalent to [[agg]] (same column names). */
  def sql(c: String): String = {
    val varExpr =
      s"CAST(SUM($c*$c)*COUNT(*) - SUM($c)*SUM($c) AS DOUBLE) / " +
        s"CAST(COUNT(*)*(COUNT(*)-1) AS DOUBLE)"
    (Seq(
      s"CAST(COUNT(*) AS BIGINT) AS ${c}_n",
      s"CAST(SUM($c) AS BIGINT) AS ${c}_total",
      s"CAST(MIN($c) AS BIGINT) AS ${c}_min",
      s"CAST(MAX($c) AS BIGINT) AS ${c}_max",
      s"CAST(floor(SUM($c) / COUNT(*)) AS BIGINT) AS ${c}_avg",
      s"CAST(floor(sqrt($varExpr)) AS BIGINT) AS ${c}_std") ++
      Ps.map { case (nm, p) =>
        s"CAST(floor(quantile_cont($c, $p)) AS BIGINT) AS ${c}_p$nm"
      }).mkString(",\n    ")
  }
}
