package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-linear classifier score with BROADCAST weights — the form that
  * scales in MODEL size, not just corpus size.
  *
  * The literal-weights fold (`TextStats.clfScoreWith`) embeds the weight
  * table in the plan as a `CreateArray` of B literals: fine at B=64, but a
  * production fastText-style hashed-linear model has B~10⁶ buckets, and an
  * O(B) expression tree would be re-analyzed, re-serialized and re-shipped
  * with every task (VERDICT r8 ask #2). Here the weights ride a
  * `Broadcast[Array[Long]]`: the plan carries ONE reference object
  * (`ctx.addReferenceObj`), executors deserialize the array once per JVM
  * via the torrent broadcast, and the per-row work is a single static call
  * inside whole-stage codegen — same tier as [[Hash60]]/[[DotI64]]
  * (SURVEY §2.10 tier (b)).
  *
  * Score parity with the literal fold is exact by construction: the same
  * single-space split with limit -1 (Spark's `split(text, " ")` keeps
  * trailing empty tokens), the same [[Hash60]] token hash, the same
  * `% B` bucketing and long-sum — pinned by TextStatsSpec at B=64 (equal
  * to `clfScoreWith`) and exercised at B=65536 where the literal form's
  * plan would carry 65k nodes. */
case class ClfScoreBcast(child: Expression, weights: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"clf_score_bcast requires a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "clf_score_bcast"

  override def nullSafeEval(s: Any): Any =
    ClfScoreBcast.score(s.asInstanceOf[UTF8String], weights.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one reference slot in the generated class; .value() resolves the
    // executor-local broadcast block (no per-row or per-task deserialization)
    val bc = ctx.addReferenceObj("clfWeights", weights,
      classOf[Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ClfScoreBcast.score($c, (long[]) $bc.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): ClfScoreBcast =
    copy(child = newChild)
}

object ClfScoreBcast {

  /** Sum of bucket weights over the document's tokens. Split semantics
    * mirror Spark's `split(text, " ")` (regex, limit -1): consecutive
    * spaces yield empty tokens and a trailing space yields a trailing empty
    * token, all of which hash and score — required for exact score parity
    * with the q84/q104 literal fold. */
  def score(s: UTF8String, w: Array[Long]): Long = {
    val b = w.length
    var acc = 0L
    for (tok <- s.toString.split(" ", -1))
      acc += w((Hash60.compute(tok.getBytes("UTF-8")) % b).toInt)
    acc
  }

  /** Column form: broadcasts `weights` on `spark` and wraps the expression.
    * The broadcast is created once per call — callers scoring multiple
    * columns should reuse the returned Column's broadcast by building the
    * scorer once. */
  def column(spark: org.apache.spark.sql.SparkSession, text: Column,
      weights: Array[Long]): Column = {
    val bc = spark.sparkContext.broadcast(weights)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ClfScoreBcast(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), bc))
  }
}
