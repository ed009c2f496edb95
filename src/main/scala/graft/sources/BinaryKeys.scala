package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decoding of binary partition keys (X4, ColumnFamilyBackend.java:163-166;
  * fixtures carry 8-byte big-endian longs). */
object BinaryKeys {

  /** The 8 big-endian bytes as a SIGNED long — the native
    * [[graft.functions.BeLong]] expression (round 13: a direct byte read
    * inside whole-stage codegen; the builtin composition below allocates
    * two hex strings and re-parses them per row, in the hot path of
    * every decoded-key operator). Falls back to the builtin form when no
    * session is active (pure column construction). */
  def beLong(key: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.GraftFunctions.ensureRegistered(s)
        graft.functions.GraftFunctions.beLong(key)
      case None => beLongBuiltin(key)
    }

  /** Pure-builtin form (no function registration required). A single
    * `CAST(conv(hex(key), 16, 10) AS BIGINT)` is unsigned: any key with the
    * top bit set exceeds Long.MaxValue and the cast yields null (or fails
    * under ANSI). Splitting into two 32-bit halves keeps each `conv` result
    * in the positive domain; `shiftleft` reassembles the sign bit through
    * two's-complement wrap. */
  def beLongBuiltin(key: Column): Column =
    shiftleft(conv(hex(substring(key, 1, 4)), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(hex(substring(key, 5, 4)), 16, 10).cast("long"))

  /** The inverse: a long as its 8 big-endian bytes (the stored partition-
    * key encoding) — native [[graft.functions.BeLongBytes]], builtin
    * fallback when sessionless. */
  def beLongBytes(k: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.GraftFunctions.ensureRegistered(s)
        graft.functions.GraftFunctions.beLongBytes(k)
      case None => beLongBytesBuiltin(k)
    }

  /** Pure-builtin inverse — `hex(long)` is the full 16-digit
    * two's-complement form, so negatives encode correctly too. */
  def beLongBytesBuiltin(k: Column): Column =
    unhex(lpad(hex(k), 16, "0"))
}
