package graft

import org.apache.spark.sql.functions._

import graft.ops.EventsOps
import graft.sources.Tables

/** q142/q143: cube and pivot internal consistency. */
class OlapSpec extends SparkSpec {

  test("cube granularities are mutually consistent") {
    val rows = EventsOps.cubeRollup(spark, Sf0001).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = byGid(3L).head
    // every granularity's event counts sum to the grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(byGid(gid).map(_.getAs[Long]("events")).sum ==
        total.getAs[Long]("events"), s"gid $gid")
      assert(byGid(gid).map(_.getAs[Long]("value_x100_sum")).sum ==
        total.getAs[Long]("value_x100_sum"), s"gid $gid")
    }
    // the cube plan is one Expand feeding one aggregate, not a union
    val plan = EventsOps.cubeRollup(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(1200))
    assert(!plan.contains("Union"), plan.take(1200))
  }

  test("sstablepartitions (q214): every flag class non-vacuous, every " +
      "row over at least one threshold, and the filter agrees with a " +
      "recount from the pscan relation (round 16)") {
    import graft.ops.PStats
    val rows = PStats.largePartitions(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // a reported partition crossed at least one threshold; the flags
    // restate the dimensions exactly
    rows.foreach { r =>
      val (size, cells, tombs) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getBoolean(5) === (size >= PStats.PartitionSizeThreshold))
      assert(r.getBoolean(6) === (cells >= PStats.PartitionCellThreshold))
      assert(r.getBoolean(7) ===
        (tombs >= PStats.PartitionTombstoneThreshold))
      assert(r.getBoolean(5) || r.getBoolean(6) || r.getBoolean(7))
    }
    // each threshold flags someone at this sf (the report's three
    // branches are all live)
    assert(rows.exists(_.getBoolean(5)))
    assert(rows.exists(_.getBoolean(6)))
    assert(rows.exists(_.getBoolean(7)))
    // the filter kept exactly the crossing partitions
    val expect = graft.sources.Fixtures.liPscan(spark, Sf0001)
      .where(col("size") >= PStats.PartitionSizeThreshold ||
        col("cell_count") >= PStats.PartitionCellThreshold ||
        col("tombstone_count") >= PStats.PartitionTombstoneThreshold)
      .count()
    assert(rows.length.toLong === expect)
  }

  test("funnel steps are monotone and conversions bounded") {
    val r = EventsOps.funnel(spark, Sf0001).collect().head
    def g(n: String) = r.getAs[Long](n)
    assert(g("users_total") >= g("step1_signup"))
    assert(g("step1_signup") >= g("step2_click"))
    assert(g("step2_click") >= g("step3_purchase"))
    assert(g("step1_signup") > 0 && g("step2_click") > 0)
    assert(g("conv2_x1000") <= 1000L && g("conv3_x1000") <= 1000L)
  }

  test("retention cohorts partition the user base; windows bounded") {
    val rows = EventsOps.retention(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, Sf0001)
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("cohort_users")).sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("retained_w1") <= r.getAs[Long]("cohort_users"))
      assert(r.getAs[Long]("retained_w2") <= r.getAs[Long]("cohort_users"))
      assert(r.getAs[Long]("retained_w4") <= r.getAs[Long]("cohort_users"))
    }
  }

  test("pivot columns sum back to the per-day event totals") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = EventsOps.pivotDaily(spark, Sf0001).collect()
    val perDay = Tables.events(spark, Sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide.nonEmpty && wide.length == perDay.size)
    wide.foreach { r =>
      val sum = types.map(t => r.getAs[Long](t)).sum
      assert(sum == perDay(r.getString(0)), s"day ${r.getString(0)}")
    }
  }
}
