package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write side of the training-data pipeline: persist a curated corpus as
  * hive-partitioned parquet (`source=<v>/part-*.parquet`).
  *
  * Scale choices:
  *  - `repartition(source)` co-locates each partition value before the
  *    write, so every task writes whole files for one partition directory
  *    instead of every task opening a writer per value (the small-files
  *    explosion at 1000 executors × N sources);
  *  - `sortWithinPartitions(source, doc_id)` gives deterministic, locality-
  *    friendly row order inside each file;
  *  - `maxRecordsPerFile` bounds file size so downstream readers get
  *    splittable, uniform inputs;
  *  - readers that filter on `source` get directory-level partition pruning
  *    for free (PartitionFilters in the scan).
  *
  * For very skewed source distributions, pass `filesPerSource > 1` to fan
  * one hot source across several writers (repartition on (source, salt)).
  */
object CorpusSink {

  def writeParquet(df: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 1000000L, filesPerSource: Int = 1): Unit = {
    val parted =
      if (filesPerSource <= 1) df.repartition(col("source"))
      else df.repartition(col("source"),
        pmod(hash(col("doc_id")), lit(filesPerSource)))
    parted
      .sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("source")
      .parquet(outDir)
  }
}
