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
}
