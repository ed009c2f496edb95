package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for q208's dropDuplicatesWithinWatermark trajectory. */
object DedupReplayProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val got = graft.streaming.StreamingStats.dedupReplayOnce(spark, dir)
    got.show(50, false)
    // hypothesis: emitted = all staged rows EXCEPT batch 2's
    // republication; the batch-4 republication lands at rh+8
    val anchor = graft.streaming.StreamingStats.WatermarkAnchorUs
    val ev = graft.sources.Tables.events(spark, dir)
      .withColumn("rh",
        expr(s"(unix_micros(ts) - $anchor) div 3600000000"))
    val dupKeys = col("rh") === 0L
    val want = ev.where((col("rh") >= 0L && col("rh") < 2L) ||
        (col("rh") >= 4L && col("rh") < 10L))
      .select(col("rh"), col("event_type"), col("event_id"), col("value"))
      .unionByName(ev.where(dupKeys)
        .select((col("rh") + 8L).as("rh"), col("event_type"),
          col("event_id"), col("value")))
      .groupBy("rh", "event_type")
      .agg(count(lit(1)).as("events"),
        sum(col("event_id") % 1000003L).as("id_sum"),
        sum(floor(col("value") * 100).cast("long")).as("value_x100"))
      .orderBy("rh", "event_type")
    val g = got.collect().map(_.toString).toSeq
    val w = want.collect().map(_.toString).toSeq
    println(s"match=${g == w}")
    if (g != w) {
      println("only-in-got:  " + g.diff(w).mkString(" | "))
      println("only-in-want: " + w.diff(g).mkString(" | "))
    }
    spark.stop()
  }
}
