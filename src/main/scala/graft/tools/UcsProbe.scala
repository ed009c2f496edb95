package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for UCS plan shape at a given sf dir (dev aid). */
object UcsProbe {
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
    val inPath = graft.sources.datadb.CassandraDataFixture
      .ensureUcsFiles(spark, dir)
    val p = graft.ops.UnifiedCompaction.plan(spark, inPath)
    println(s"m=${p.m}")
    p.metas.sortBy(_.id).foreach(s => println(
      f"${s.id}%-8s bytes=${s.bytes}%9d span=${s.spanUnits}%6d " +
        f"density=${s.density}%12d ratio=${s.density / p.m}%5d " +
        f"level=${s.level}"))
    println(s"merged=${p.merged}")
    println(s"passthrough=${p.passthrough}")
    val out = graft.ops.UnifiedCompaction.roundtrip(spark, dir)
    out.show(50, false)
    graft.ops.UnifiedCompaction.reingestTable(spark, dir).show(20, false)
    // purge-branch occupancy: droppable winners per group, and how many
    // lack any outside holder (purged) vs have one (retained)
    import org.apache.spark.sql.functions._
    val ev = graft.sources.datadb.DataDb.cells(spark, inPath,
        format = graft.sources.datadb.DataDbScan.FormatCassandra)
      .withColumn("sstable_id", concat(lit("sst-"),
        (regexp_extract(col("sstable_id"), "nb-(\\d+)-big", 1)
          .cast("long") - 1L).cast("string")))
    import spark.implicits._
    val memberGroup = p.merged.zipWithIndex.flatMap {
      case ((_, ids), g) => ids.map(id => (id, g))
    }
    val groupDf = memberGroup.toDF("sstable_id", "g")
    val winners = ev.join(broadcast(groupDf), "sstable_id")
      .groupBy("g", "key", "clustering", "column_name")
      .agg(max(struct(col("timestamp_us"), col("sstable_id"),
        col("size_bytes"), col("is_tombstone"),
        col("local_deletion_time_s"), col("ttl_s"),
        col("is_expiring"), col("kind"))).as("w"))
      .where(col("w.is_tombstone") && col("w.local_deletion_time_s") <
        graft.sources.Fixtures.GcBeforeS)
    val outside = ev.join(broadcast(groupDf), Seq("sstable_id"), "left")
      .select(coalesce(col("g"), lit(-1)).as("og"), col("key"))
    val flagged = winners.join(
        outside.select("og", "key").distinct().as("o"),
        winners("key") === col("o.key") && col("og") =!= winners("g"),
        "left_semi")
    println(s"droppable winners per group: " +
      winners.groupBy("g").count().collect().toSeq.sortBy(_.getInt(0))
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
    println(s"retained (outside holder exists): " +
      flagged.groupBy("g").count().collect().toSeq.sortBy(_.getInt(0))
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", "))
    spark.stop()
  }
}
