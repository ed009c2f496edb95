package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** q141: salting must change the shuffle distribution and NOTHING else. */
class SkewSpec extends SparkSpec {

  test("salted rollup equals the plain (unsalted) join exactly") {
    val salted = Skew.saltedRollup(spark, Sf0001).collect().toSeq
    val plain = Skew.plainRollup(spark, Sf0001).collect().toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
    // the demo skew is real: key 0 carries about half the fact
    val total = salted.map(_.getAs[Long]("events")).sum
    val hot = salted.find(_.getAs[Long]("skey") == 0L).get
      .getAs[Long]("events")
    assert(hot * 3 > total, s"hot key carries $hot of $total")
  }

  test("the hot key's fact rows spread across salt reducers") {
    val fact = Skew.skewedFact(spark, Sf0001)
      .withColumn("fsalt", pmod(col("event_id"), lit(8L)))
      .where(col("skey") === 0L)
    // murmur3 spread of the JOIN keys over 32 reducers: unsalted, the
    // hot key lands on exactly one; salted, on up to 8 distinct ones
    val unsalted = fact.select(pmod(hash(col("skey")), lit(32)))
      .distinct().count()
    val saltedSpread = fact
      .select(pmod(hash(col("skey"), col("fsalt")), lit(32)))
      .distinct().count()
    assert(unsalted == 1L)
    assert(saltedSpread >= 6L, s"spread only $saltedSpread of <= 8")
  }

  test("the salted plan joins on (skey, fsalt) with the dim replicated") {
    val plan = Skew.saltedRollup(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("fsalt"), plan.take(1500))
  }
}
