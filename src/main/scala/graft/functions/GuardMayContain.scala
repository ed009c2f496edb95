package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

import graft.ops.PurgeGuard

/** The purge guard's STAGE-1 prefilter as a codegen'd Catalyst
  * expression (round 15, replacing a Scala UDF): "may some sstable
  * outside `group` contain `key`?" answered from the broadcast sidecar
  * metadata (Summary.db key ranges + Filter.db blooms).
  *
  * Same mold as [[ClfScoreBcast]] (SURVEY §2.10 tier (b)): the guard
  * array rides ONE `ctx.addReferenceObj` broadcast reference — resolved
  * once per executor JVM, never per row — and the per-row work is a
  * single static call that stays inside whole-stage codegen. The UDF
  * form it replaces was interpreted: each droppable-winner row crossed
  * the catalyst→Scala boundary with boxed arguments, which is the wrong
  * tier once droppable-tombstone volume grows (a 100 TB compaction's
  * winners after the droppable filter can still be millions of rows).
  *
  * Bit-equality with the driver-side [[PurgeGuard.mayContainOutside]]
  * is structural — both paths call the same function — and pinned by
  * spec over boundary and bloom-miss keys. */
case class GuardMayContain(left: Expression, right: Expression,
    guards: Broadcast[Array[PurgeGuard.SstGuard]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"guard_may_contain requires (int group, long key), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "guard_may_contain"

  override def nullSafeEval(group: Any, key: Any): Any =
    PurgeGuard.mayContainOutside(guards.value,
      group.asInstanceOf[Int], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // one reference slot in the generated class; .value() resolves the
    // executor-local broadcast block (no per-row deserialization). The
    // Object-typed bridge sidesteps Janino's nested-array-type parsing.
    val bc = ctx.addReferenceObj("purgeGuards", guards,
      classOf[Broadcast[Array[PurgeGuard.SstGuard]]].getName)
    defineCodeGen(ctx, ev, (g, k) =>
      s"graft.ops.PurgeGuard.mayContainOutsideRef($bc.value(), $g, $k)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GuardMayContain =
    copy(left = newLeft, right = newRight)
}

object GuardMayContain {

  /** Column form over an already-created broadcast. */
  def column(group: Column, key: Column,
      guards: Broadcast[Array[PurgeGuard.SstGuard]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      GuardMayContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(group),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(key),
        guards))
}
