package graft

import org.apache.spark.sql.functions._

import graft.sources.Fixtures

/** Scale evidence for the co-located-join strategy SURVEY §2.3/§4 call out:
  * when both sides of a repeated join are bucketed on the join key with the
  * same bucket count, Spark plans a sort-merge join with NO shuffle exchange
  * — the 100 TB deployment shape for the pscan ⋈ sstable_meta joins that
  * replace the reference's side-band accumulators. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    // force the join to its shuffle-shaped form (no broadcast shortcut), and
    // read the final plan directly (no AQE re-wrapping)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pscan = Fixtures.liPscan(spark, Sf0001)
      spark.sql("DROP TABLE IF EXISTS b_pscan")
      spark.sql("DROP TABLE IF EXISTS b_meta")
      pscan.write.bucketBy(8, "sstable_id").sortBy("sstable_id")
        .saveAsTable("b_pscan")
      Fixtures.sstableMeta(pscan)
        .select("sstable_id", "uncompressed_length", "level")
        .write.bucketBy(8, "sstable_id").sortBy("sstable_id")
        .saveAsTable("b_meta")

      val joined = spark.table("b_pscan")
        .join(spark.table("b_meta"), Seq("sstable_id"))
        .select(col("sstable_id"), col("key"), col("size"),
          col("uncompressed_length"), col("level"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() === pscan.count())

      // the unbucketed control DOES shuffle — the assertion above is not
      // vacuous
      val control = pscan
        .join(Fixtures.sstableMeta(pscan)
          .select("sstable_id", "uncompressed_length", "level"),
          Seq("sstable_id"))
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("inverted index: bucket-pruned probes read only the terms' buckets") {
    import graft.ops.Search
    Search.buildIndex(spark, Sf0001, "b_postings", buckets = 8)
    // the auto-bucketed-scan heuristic drops the bucketed read (and with
    // it bucket pruning) when the probe side broadcasts — a deployed
    // search service pins it off (see probeIndex docs)
    val prevAuto =
      spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = Search.probeIndex(spark, "b_postings", Seq("dup", "scan"))
      // planning-time bucket pruning: the scan must select a strict
      // subset of the 8 buckets (the two terms hash into at most 2)
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of 8".r
        .findFirstMatchIn(plan)
      assert(sel.nonEmpty, s"no bucket pruning in:\n${plan.take(1500)}")
      assert(sel.get.group(1).toInt <= 2)

      // probe results == brute-force token scan
      val rows = probe.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val brute = graft.sources.Tables.documents(spark, Sf0001)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .where(col("t").isin("dup", "scan"))
        .groupBy("t", "doc_id").count()
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === brute)
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    }
  }
}
