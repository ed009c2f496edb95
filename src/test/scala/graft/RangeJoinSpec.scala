package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventsOps
import graft.sources.Tables

/** q136: the bucketed interval join must equal the direct (quadratic)
  * non-equi join, and must never plan as a cartesian/BNLJ. */
class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the direct non-equi join") {
    val got = EventsOps.sessionRangeJoin(spark, Sf0001, topN = 20).collect()
    assert(got.length == 20)

    // direct quadratic reference: every (interval, event) pair compared
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val refRows = got.map { r =>
      val owner = r.getAs[Long]("owner_id")
      val s = r.getAs[Long]("start_us"); val e = r.getAs[Long]("end_us")
      val m = ev.where(col("user_id") =!= owner &&
          col("ts_us") >= s && col("ts_us") <= e)
        .agg(count(lit(1)), countDistinct("user_id")).head()
      (owner, s, e, m.getLong(0), m.getLong(1))
    }
    got.zip(refRows).foreach { case (r, (owner, s, e, xev, xus)) =>
      assert(r.getAs[Long]("xuser_events") == xev,
        s"owner $owner [$s,$e]: events ${r.getAs[Long]("xuser_events")} != $xev")
      assert(r.getAs[Long]("xusers") == xus)
    }
  }

  test("plan is an equi hash join on bucket — no cartesian, no BNLJ") {
    val plan = EventsOps.sessionRangeJoin(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("every event lands in exactly one bucket (no dup candidate pairs)") {
    // intervals spanning multiple buckets must still count each matching
    // event once: compare xuser_events against a distinct-event count
    val got = EventsOps.sessionRangeJoin(spark, Sf0001, topN = 5,
      bucketUs = 60L * 1000000L).collect() // 1-min buckets: wide spans
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    got.foreach { r =>
      val distinct = ev.where(col("user_id") =!= r.getAs[Long]("owner_id") &&
          col("ts_us") >= r.getAs[Long]("start_us") &&
          col("ts_us") <= r.getAs[Long]("end_us"))
        .select("event_id").distinct().count()
      assert(r.getAs[Long]("xuser_events") == distinct)
    }
  }
}
