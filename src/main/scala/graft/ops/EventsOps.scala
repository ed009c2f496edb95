package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch analytics over the events stream table — the batch mirror of the
  * Structured Streaming pipelines in graft.streaming (same aggregation
  * semantics, so the streaming variant is testable against this). */
object EventsOps {

  /** Tumbling 1-hour rollup per event type. value sums are exact bigints
    * (floor(value·100)) so results are summation-order independent. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH")
          .as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("value_x100"),
        countDistinct("user_id").as("users"))
      .orderBy("hour", "event_type")

  /** Sessionization: per-user session count with a 30-minute inactivity gap,
    * via lag() — one shuffle on user_id, no driver state. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("sessions"), count(lit(1)).as("events"))
      .orderBy("user_id")
  }

  /** As-of join: each `error` event matched to the most recent strictly
    * earlier `click` by the same user. Composed as union + ignore-nulls
    * `last()` over a (ts, event_id)-ordered window — ONE shuffle on
    * user_id, versus a range join's quadratic candidate explosion. The
    * strict `-1` frame end plus the unique event_id ordering makes the
    * match total and engine-exact (no ts-tie ambiguity). This is the
    * preference-order (a) form of SURVEY's custom-operator policy: as-of
    * semantics composed from existing operators, no custom plan node. */
  def errorAsofClick(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .where(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("click_ts_us",
        when(col("event_type") === "click", col("ts_us")))
      .withColumn("prev_click_id",
        last("click_id", ignoreNulls = true).over(w))
      .withColumn("prev_click_ts_us",
        last("click_ts_us", ignoreNulls = true).over(w))
      .where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("prev_click_id"),
        (col("ts_us") - col("prev_click_ts_us")).as("lag_us"))
      .orderBy("event_id")
  }

  /** JSON property extraction + rollup: `props` is a JSON string column
    * (the norm for training-data manifests); `get_json_object` stays in
    * whole-stage codegen, then a tiny per-type aggregate. */
  def propsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("events"),
        sum("k").as("k_total"),
        min("k").as("k_min"),
        max("k").as("k_max"))
      .orderBy("event_type")
}
