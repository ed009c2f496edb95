package graft

import org.apache.spark.sql.functions.{count, expr, sum}

import graft.sources.Tables

/** Proves the TIMESTAMP_NTZ normalization in [[graft.sources.Tables.events]]
  * is session-timezone independent (ADVICE r8 / VERDICT r9 ask #2).
  *
  * events.parquet stores `ts` as TIMESTAMP(MICROS, isAdjustedToUTC=false);
  * with `spark.sql.parquet.inferTimestampNTZ.enabled=true` Spark surfaces it
  * as TIMESTAMP_NTZ whose wall-clock is defined as UTC. A naive
  * `cast(ts as timestamp)` re-interprets that wall-clock in the session zone
  * and shifts every instant by the zone offset for non-UTC callers. The fix
  * (`convert_timezone('UTC', current_timezone(), ts)` before the cast) must
  * yield identical epoch instants under any session zone.
  */
class TimezoneSpec extends SparkSpec {

  private val TzKey  = "spark.sql.session.timeZone"
  private val NtzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"

  /** Sum of epoch-micros + row count of Tables.events under a session zone. */
  private def fingerprint(zone: String): (Long, Long) = {
    spark.conf.set(TzKey, zone)
    val r = Tables.events(spark, Sf0001)
      .agg(sum(expr("unix_micros(ts)")).as("s"), count(expr("*")).as("n"))
      .first()
    (r.getLong(0), r.getLong(1))
  }

  test("Tables.events instants are unshifted in a non-UTC session") {
    val oldTz  = spark.conf.get(TzKey)
    val oldNtz = spark.conf.get(NtzKey)
    try {
      spark.conf.set(NtzKey, "true")
      // Sanity: the NTZ branch is actually the one under test.
      spark.conf.set(TzKey, "UTC")
      assert(
        spark.read.parquet(s"$Sf0001/events.parquet").schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType,
        "expected events.ts to read as TIMESTAMP_NTZ with inference enabled")

      val utc = fingerprint("UTC")
      assert(utc._2 > 0, "events table must be non-empty")
      // East and west of UTC, plus a half-hour-offset zone.
      for (zone <- Seq("America/New_York", "Asia/Tokyo", "Asia/Kolkata")) {
        assert(fingerprint(zone) == utc,
          s"Tables.events instants shifted under session zone $zone")
      }
    } finally {
      spark.conf.set(TzKey, oldTz)
      spark.conf.set(NtzKey, oldNtz)
    }
  }
}
