package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.filterdb.FilterDbFormat

/** Codegen probe of a BROADCAST Cassandra-format bloom filter — the
  * 100 TB shape of the q116 contamination prefilter (VERDICT r9 ask #6).
  *
  * The point of q116 is probing the SAME murmur3/OffHeapBitSet bloom
  * implementation that reads Filter.db, which no built-in expression does;
  * the previous form was a per-row interpreted Scala UDF carrying
  * LongAdder instrumentation on the hot path. Here the filter rides a
  * `Broadcast[FilterDbFormat.Filter]` exactly like [[ClfScoreBcast]]'s
  * weights: the plan carries one `ctx.addReferenceObj` slot, executors
  * resolve the broadcast block once per JVM, and the per-row work is a
  * single static call inside whole-stage codegen — no UDF wrapper, no
  * shared-counter cache-line traffic per row. Probe/survivor counts are
  * recovered relationally in the spec (probes = candidate rows, survivors
  * = rows passing the predicate), which also pins codegen/driver parity
  * against a driver-side replay of `mightContain`. */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[FilterDbFormat.Filter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string argument, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(s: Any): Any =
    BloomMightContain.probe(s.asInstanceOf[UTF8String], bloom.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[Broadcast[FilterDbFormat.Filter]].getName)
    // helper takes Object (erased broadcast payload) so the generated Java
    // never needs the Scala-nested Filter class name
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomMightContain.probe($c, $bc.value())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /** Static per-row kernel: UTF-8 bytes of the shingle through the
    * Cassandra murmur3 double-hash probe. `bloom` is typed Object so the
    * codegen call site stays plain Java. */
  def probe(s: UTF8String, bloom: Object): Boolean =
    bloom.asInstanceOf[FilterDbFormat.Filter].mightContain(s.getBytes)

  /** Column form over an already-created broadcast (reuse across columns). */
  def column(text: Column, bloom: Broadcast[FilterDbFormat.Filter]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), bloom))
}
