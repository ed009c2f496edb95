package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Formatters._
import graft.render.TableBuilder

/** X1/X2/X3/X6/X7 formatter semantics (derived from Util.java:26-98) and
  * K1 TableBuilder alignment rules (TableBuilder.java:51-81). */
class FormattersSpec extends AnyFunSuite {

  test("humanReadableByteCount: SI units, <1000 passthrough") {
    assert(humanReadableByteCount(0) == "0 B")
    assert(humanReadableByteCount(999) == "999 B")
    assert(humanReadableByteCount(1000) == "1.0 kB")
    assert(humanReadableByteCount(1536) == "1.5 kB")
    assert(humanReadableByteCount(1000000) == "1.0 MB")
    assert(humanReadableByteCount(2500000000L) == "2.5 GB")
    assert(humanReadableByteCount(1000000000000L) == "1.0 TB")
  }

  test("humanReadableDateDiff: exact Util.java:66-98 semantics") {
    // minutes and seconds print unconditionally
    assert(humanReadableDateDiff(5000) == "0m 5s")
    assert(humanReadableDateDiff(65000) == "1m 5s")
    // residual seconds are CEILed
    assert(humanReadableDateDiff(1500) == "0m 2s")
    assert(humanReadableDateDiff(1000) == "0m 1s")
    assert(humanReadableDateDiff(0) == "0m 0s")
    // hours print only when >= 1 — zero hours after days is omitted
    assert(humanReadableDateDiff(3600000) == "1h 0m 0s")
    assert(humanReadableDateDiff(90061000) == "1d 1h 1m 1s")
    assert(humanReadableDateDiff(86400000) == "1d 0m 0s")
    assert(humanReadableDateDiff(86400000 + 184000) == "1d 3m 4s")
  }

  test("timestamp format: UTC yyyy-MM-dd HH:mm:ss.SSS from micros") {
    assert(formatTimestampUs(0L) == "1970-01-01 00:00:00.000")
    assert(formatTimestampUs(1700000000123456L) == "2023-11-14 22:13:20.123")
  }

  test("sentinels: MAX_VALUE deletion time blank, -1 ttl NO_TTL") {
    assert(formatDeletionTimeS(Int.MaxValue.toLong) == "")
    assert(formatDeletionTimeS(0L) == "1970-01-01 00:00:00.000")
    assert(formatTtl(-1L) == "NO_TTL")
    assert(formatTtl(86400L) == "1d 0m 0s")
  }

  test("repair render") {
    assert(repairRender(3, 6, 50) == "3/6 50%")
  }

  test("TableBuilder: borders, col0 left-aligned, others right-aligned") {
    val s = new TableBuilder()
      .setHeader("Key", "Size")
      .addRow("a", "10")
      .addRow("longer", "5")
      .toString
    val expected =
      """+--------+------+
        || Key    | Size |
        |+--------+------+
        || a      |   10 |
        || longer |    5 |
        |+--------+------+
        |""".stripMargin
    assert(s == expected)
  }
}
