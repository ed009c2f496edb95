package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.datadb.{CassandraDataFixture, DataDb, DataDbScan}

/** Lightweight transactions (compare-and-set), executed end to end
  * (round 16) — the serial path Cassandra's Paxos provides: per
  * partition, conditional writes apply IN ORDER, each one's condition
  * judged against the register state the PREVIOUS applied write left
  * behind. What makes LWT fundamentally different from every other
  * operator here is that it cannot be expressed as a commutative
  * fold: the outcome of op i depends on the exact prefix of applied
  * ops before it, so the engine runs a per-key sequential state
  * machine — and the parallelism axis is ACROSS partitions (Paxos is
  * per-partition serial in the real system too; that is its
  * documented contract and its scalability model).
  *
  *  - **Ops.** Every corpus event, in timestamp order per key:
  *    `IF register = clustering THEN SET register = value%3`
  *    (register starts at 0). Ties beyond (ts, expected, newval) are
  *    identical ops, so the chain is order-insensitive where the sort
  *    is — the determinism argument the oracle's replay rests on.
  *  - **Engine.** `groupByKey(key).flatMapGroups`: the typed
  *    per-group state machine (a bounded group — a partition's ops),
  *    emitting one register summary per key; per-bucket rollups
  *    follow as ordinary aggregates.
  *  - **Oracle.** A DuckDB RECURSIVE CTE walks the same chains —
  *    one iteration per op index, every key advancing in parallel —
  *    and must land on identical applied counts, final registers and
  *    applied-op digests.
  *
  * Scale shape: groups are single partitions (bounded by the
  * partition-size invariants every other operator relies on); the
  * state machine is O(ops-per-partition) with no cross-key
  * dependency, so the shuffle is one exchange on key and the fold
  * never leaves the executor. */
object CasRegister {

  /** Rollup buckets (key % Buckets). */
  val Buckets = 16L

  private val M = 1000003L

  /** q232: per-bucket CAS outcomes — registers, ops, applied /
    * rejected counts, and digests over the applied ops and the final
    * register values. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val inPath = CassandraDataFixture.ensureFiles(spark, dir,
      compressed = true)
    import spark.implicits._
    // the scan feeds a typed flatMapGroups exchange — per-row scan work
    // is light (a 4-column projection), so the per-task cold-wave floor
    // dominates extra splits: fixed split cap (DataDbScan.LightRowWorkSplit)
    val ops = DataDb.cells(spark, inPath,
        format = DataDbScan.FormatCassandra,
        maxSplitBytes = DataDbScan.LightRowWorkSplit)
      .select(col("key"), col("clustering").as("expected"),
        pmod(col("size_bytes"), lit(3L)).as("newval"),
        col("timestamp_us"))
      .as[(Long, Long, Long, Long)]
    val perRegister = ops.groupByKey(_._1).flatMapGroups {
      (k: Long, it: Iterator[(Long, Long, Long, Long)]) =>
        // ts order with (expected, newval) tiebreaks; deeper ties are
        // identical ops, so the fold is deterministic
        val sorted = it.toArray.sortBy(t => (t._4, t._2, t._3))
        var reg = 0L
        var applied = 0L
        var appliedDigest = 0L
        sorted.foreach { case (_, expected, newval, ts) =>
          if (expected == reg) {
            reg = newval
            applied += 1
            appliedDigest += graft.functions.PortableHash
              .h60(s"$k:$expected:$newval:$ts") % M
          }
        }
        Iterator((k, sorted.length.toLong, applied,
          sorted.length - applied, reg, appliedDigest,
          graft.functions.PortableHash.h60(s"$k:$reg") % M))
    }.toDF("key", "ops", "applied", "rejected", "final_value",
      "applied_digest", "final_digest")
    perRegister
      .groupBy(pmod(col("key"), lit(Buckets)).as("bucket"))
      .agg(
        count(lit(1)).as("registers"),
        sum("ops").as("ops"),
        sum("applied").as("applied"),
        sum("rejected").as("rejected"),
        sum("final_value").as("final_sum"),
        sum("applied_digest").as("applied_digest"),
        sum("final_digest").as("final_digest"))
      .orderBy("bucket")
  }
}
