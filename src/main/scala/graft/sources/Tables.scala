package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under `dir`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** events.parquet has carried TIMESTAMP(NANOS) (readable only as long via
    * spark.sql.legacy.parquet.nanosAsLong=true) and TIMESTAMP(MICROS) with no
    * timezone (read as TIMESTAMP_NTZ unless
    * spark.sql.parquet.inferTimestampNTZ.enabled=false) across testdata
    * generations. Normalize both here to a plain microsecond TimestampType so
    * downstream watermarks / unix_micros always see a timestamp column,
    * independent of session conf. The stored NTZ wall-clock is defined as
    * UTC, so it is first converted to the session zone's wall-clock and only
    * then cast — a plain `cast(ts as timestamp)` would re-interpret the UTC
    * wall-clock in the session zone and shift every instant for any caller
    * whose session is not UTC (ADVICE r8). For UTC sessions the conversion
    * is the identity relabel it always was. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts",
        expr("cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
