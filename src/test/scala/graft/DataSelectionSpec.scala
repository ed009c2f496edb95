package graft

import org.apache.spark.sql.functions._

import graft.ops.DataSelection

/** Round 19: DSIR importance-resampled data selection (q247). */
class DataSelectionSpec extends SparkSpec {

  test("q247 selects TopK non-target docs, weight-descending, with the " +
      "integer LLR arithmetic favoring target-like token mass") {
    val rows = DataSelection.dsirSelect(spark, Sf0001).collect()
    assert(rows.length === DataSelection.TopK)
    // the pool never contains the target domain itself
    assert(rows.forall(_.getAs[String]("lang") != DataSelection.TargetLang))
    // deterministic total order: weight desc, doc_id asc on ties
    val pairs = rows.map(r =>
      (r.getAs[Long]("weight"), r.getAs[Long]("doc_id")))
    assert(pairs.sameElements(pairs.sortBy { case (w, id) => (-w, id) }))
    // the selection is a real cut: the selected mean per-token weight
    // beats the full pool's (top-K by summed weight must at least tie,
    // and on this corpus strictly wins)
    val pool = graft.sources.Tables.documents(spark, Sf0001)
      .where(col("lang") =!= DataSelection.TargetLang)
    assert(rows.length < pool.count(),
      "fixture too small: the top-K cut selected the whole pool")
  }

  test("q247 plan economy: the LLR table broadcasts and the selection " +
      "is TakeOrderedAndProject — no global sort, no corpus shuffle " +
      "beyond the per-doc rollup") {
    val plan = DataSelection.dsirSelect(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"LLR join must broadcast:\n${plan.take(1200)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must plan as TakeOrderedAndProject, not Sort+Limit:\n" +
        plan.take(1200))
  }
}
