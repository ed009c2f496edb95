package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decoding of binary partition keys (X4, ColumnFamilyBackend.java:163-166;
  * fixtures carry 8-byte big-endian longs). */
object BinaryKeys {

  /** The 8 big-endian bytes as a SIGNED long. A single
    * `CAST(conv(hex(key), 16, 10) AS BIGINT)` is unsigned: any key with the
    * top bit set exceeds Long.MaxValue and the cast yields null (or fails
    * under ANSI). Splitting into two 32-bit halves keeps each `conv` result
    * in the positive domain; `shiftleft` reassembles the sign bit through
    * two's-complement wrap. All builtins, so the decode stays inside
    * whole-stage codegen. */
  def beLong(key: Column): Column =
    shiftleft(conv(hex(substring(key, 1, 4)), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(hex(substring(key, 5, 4)), 16, 10).cast("long"))

  /** The inverse: a long as its 8 big-endian bytes (the stored partition-
    * key encoding) — `hex(long)` is the full 16-digit two's-complement
    * form, so negatives encode correctly too. All builtins (codegen). */
  def beLongBytes(k: Column): Column =
    unhex(lpad(hex(k), 16, "0"))
}
