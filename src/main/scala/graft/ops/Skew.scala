package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hot-key (skew) handling for shuffle joins — the SALTING recipe: a key
  * carrying a disproportionate share of the fact side would send its
  * entire volume to one reducer in a plain shuffle join; appending a
  * fact-side salt in [0, S) and replicating each dim row S times splits
  * the hot key's rows across S reducers while keeping the join's result
  * set exactly unchanged (every fact row still meets exactly one replica
  * of its dim row). AQE's skew-join split handles the sorted-merge case
  * adaptively; salting is the deterministic, planner-independent form —
  * and the one that also works for aggregation-free pipelines. */
object Skew {

  /** The synthetic skewed fact: events with half the corpus collapsed
    * onto key 0 (documented demo skew — the operator itself is generic).
    * ~50% of a 100 TB fact on one key is exactly the shape that stalls a
    * plain shuffle join on its slowest reducer. */
  private[graft] def skewedFact(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        when(col("user_id") < 75, 0L).otherwise(col("user_id")).as("skey"),
        col("event_type"),
        floor(col("value") * 100).cast("long").as("value_x100"))

  /** The per-key dim side (derived: first event id + event count per
    * key — a stand-in for a user-profile table). */
  private[graft] def dim(spark: SparkSession, dir: String): DataFrame =
    skewedFact(spark, dir)
      .groupBy("skey")
      .agg(min("event_id").as("owner_tag"))

  /** q141: the salted join, rolled up per key. Fact rows draw a
    * deterministic salt (`event_id % salt`); the dim replicates `salt`
    * times via a literal-sequence explode (dim is the SMALL side — the
    * replication is S·|dim| rows, never fact-sized); the join keys are
    * (skey, salt), so the hot key's fact rows hash to `salt` distinct
    * reducers (spec-pinned via hash-partition spread). The rollup then
    * re-aggregates per skey — map-side partial aggregation absorbs the
    * hot key there. Result is provably identical to the unsalted join
    * (each fact row meets exactly its own salt's replica): the oracle IS
    * the unsalted join, and the spec additionally pins salted ≡ unsalted
    * in-engine. */
  def saltedRollup(spark: SparkSession, dir: String,
      salt: Int = 8): DataFrame = {
    val fact = skewedFact(spark, dir)
      .withColumn("fsalt", pmod(col("event_id"), lit(salt.toLong)))
    val dimExp = dim(spark, dir)
      .withColumn("fsalt", explode(sequence(lit(0L), lit(salt - 1L))))
    fact.join(dimExp, Seq("skey", "fsalt"))
      .groupBy("skey")
      .agg(count(lit(1)).as("events"),
        sum("value_x100").as("value_x100_sum"),
        countDistinct("event_type").as("types"),
        min("owner_tag").as("owner_tag"))
      .orderBy("skey")
  }

  /** The unsalted control — same relation, hot-key-concentrated plan
    * (what the spec proves the salted form equals). */
  private[graft] def plainRollup(spark: SparkSession, dir: String): DataFrame =
    skewedFact(spark, dir)
      .join(dim(spark, dir), Seq("skey"))
      .groupBy("skey")
      .agg(count(lit(1)).as("events"),
        sum("value_x100").as("value_x100_sum"),
        countDistinct("event_type").as("types"),
        min("owner_tag").as("owner_tag"))
      .orderBy("skey")
}
