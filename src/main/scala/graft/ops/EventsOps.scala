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

  /** q205 (round 16): EVENT-TIME SESSION WINDOWS through Spark's native
    * `session_window` aggregate — the per-SESSION grain q31's composed
    * lag-islands form rolls up away (one row per (user, session) with
    * the window bounds Spark assigns: start = first event, end = last
    * event + the 30-minute gap). The same aggregate runs unchanged as a
    * streaming query (session state MERGES across micro-batches as late
    * members arrive — spec-pinned against this batch answer on the
    * emitted frontier); the DuckDB oracle replays the islands and the
    * end = max(ts) + gap rule from parquet. One shuffle on the session
    * key; dynamic-length windows never materialize per-event state. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    sessionWindowsOf(Tables.events(spark, dir))
      .orderBy("user_id", "start_us")

  /** The shared aggregate — batch and streaming alike (unified Dataset
    * API; no sort so the streaming form plans). */
  def sessionWindowsOf(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("events"),
        sum(floor(col("value") * 100).cast("long")).as("value_x100"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("events"), col("value_x100"))

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

  /** q136: INTERVAL (range) JOIN expressed as a bucketed equi-join — the
    * generic scale recipe for "points in intervals" that Spark's builtin
    * planner would otherwise run as a BroadcastNestedLoopJoin (every event
    * compared against every interval). Intervals here are the topN
    * longest user sessions (30-min-gap sessionization, total-ordered
    * tiebreak); the probe counts OTHER users' events falling inside each
    * session's time span — a non-equi predicate with no equality column.
    *
    * Decomposition: each interval explodes into the 1-hour buckets it
    * covers (`sequence(start div 3600s, end div 3600s)`); each event maps
    * to exactly ONE bucket (`ts div 3600s`), so the bucket equi-join
    * produces each (event, interval) candidate at most once — no
    * post-join dedup — and exact containment is a residual filter. Plan:
    * BroadcastHashJoin on `bucket` (spec-pinned: no BNLJ/cartesian); with
    * millions of intervals the same decomposition runs as a shuffle
    * equi-join on bucket — cost O(events + intervals·span + matches),
    * never O(events·intervals). Empty windows are restored by a tiny
    * top⋈hits left join (50 rows), keeping the big probe side inner. */
  def sessionRangeJoin(spark: SparkSession, dir: String, topN: Int = 50,
      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val top = ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("s",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("s").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id").as("owner_id"), col("session_id"))
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("own_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(desc("duration_us"), col("owner_id"), col("session_id"))
      .limit(topN)
    val bkts = top.withColumn("bucket", explode(sequence(
      expr(s"start_us div ${bucketUs}L"), expr(s"end_us div ${bucketUs}L"))))
    val evb = ev.withColumn("ebucket", expr(s"ts_us div ${bucketUs}L"))
    val hits = evb
      .join(broadcast(bkts),
        evb("user_id") =!= bkts("owner_id") &&
          evb("ebucket") === bkts("bucket") &&
          evb("ts_us") >= bkts("start_us") && evb("ts_us") <= bkts("end_us"))
      .groupBy("owner_id", "session_id")
      .agg(count(lit(1)).as("xuser_events"),
        countDistinct("user_id").as("xusers"))
    top.join(hits, Seq("owner_id", "session_id"), "left")
      .select(col("owner_id"), col("start_us"), col("end_us"),
        col("duration_us"), col("own_events"),
        coalesce(col("xuser_events"), lit(0L)).as("xuser_events"),
        coalesce(col("xusers"), lit(0L)).as("xusers"))
      .orderBy(desc("xuser_events"), col("owner_id"), col("start_us"))
  }

  /** q142: CUBE — the OLAP multi-granularity rollup: counts and exact
    * value sums at EVERY grouping combination of (event_type, day) in one
    * pass. Spark plans this as a single Expand (each input row fans to
    * the 4 grouping sets) feeding one hash aggregate — one scan and one
    * shuffle for all granularities, versus 4 scans for the naive union.
    * `gid` is grouping_id()'s bitmask (first cube column = MSB); the
    * oracle re-derives it from the NULL pattern, which is unambiguous
    * here because neither dimension is naturally null. */
  def cubeRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        floor(col("value") * 100).cast("long").as("vx"))
      .cube("event_type", "day")
      .agg(count(lit(1)).as("events"), sum("vx").as("value_x100_sum"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type"), col("day"))

  /** q143: PIVOT — per-day wide counts, one column per event type (the
    * reporting shape). The type list is pinned (the stable public enum of
    * the stream), so the plan is a single groupBy whose aggregate list is
    * fixed at compile time — no second pass to discover columns, which is
    * what an unpinned pivot costs. Empty cells are 0, not null. */
  def pivotDaily(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy("day").pivot("event_type", types).count()
      .na.fill(0L, types)
      .orderBy("day")
  }

  /** q148: ORDERED FUNNEL — how many users progress signup → click →
    * purchase IN THAT ORDER (each later step strictly after the earlier
    * step's first occurrence): the canonical product-analytics query.
    * Step k is one conditional-min aggregate joined back on user_id, so
    * the whole funnel is K tiny aggregates co-partitioned on the same
    * key — no window over the full event stream, no per-user event-list
    * collection. Output is the one-row conversion report. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val u1 = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val u2 = e.join(u1, "user_id")
      .where(col("event_type") === "click" && col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    val u3 = e.join(u2, "user_id")
      .where(col("event_type") === "purchase" && col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"))
    val total = e.select(countDistinct("user_id").as("users_total"))
    val s1 = u1.agg(count(lit(1)).as("step1_signup"))
    val s2 = u2.agg(count(lit(1)).as("step2_click"))
    val s3 = u3.agg(count(lit(1)).as("step3_purchase"))
    total.crossJoin(s1).crossJoin(s2).crossJoin(s3)
      .withColumn("conv2_x1000",
        floor(col("step2_click") * 1000 / col("step1_signup")))
      .withColumn("conv3_x1000",
        floor(col("step3_purchase") * 1000 / col("step2_click")))
  }

  /** q149: RETENTION COHORTS — users grouped by their first-activity day;
    * per cohort: size, and how many returned in the day windows
    * (1,7], (7,14] and (14,28] after signup (window retention, the
    * growth-analytics standard). Day indices are integer epoch-day
    * arithmetic; the activity relation joins the cohort frame on user_id
    * once — two co-partitioned aggregates total. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val cohort = e.groupBy("user_id").agg(min("day").as("day0"))
    e.join(cohort, "user_id")
      .groupBy("day0")
      .agg(countDistinct("user_id").as("cohort_users"),
        countDistinct(when((col("day") - col("day0")).between(1, 7),
          col("user_id"))).as("retained_w1"),
        countDistinct(when((col("day") - col("day0")).between(8, 14),
          col("user_id"))).as("retained_w2"),
        countDistinct(when((col("day") - col("day0")).between(15, 28),
          col("user_id"))).as("retained_w4"))
      .orderBy("day0")
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
