package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst forms of the big-endian key codec
  * ([[graft.sources.BinaryKeys]]).
  *
  * The builtin compositions round-trip through HEX STRINGS —
  * `shiftleft(conv(hex(substring(key,1,4)),16,10),32) | conv(hex(...))`
  * allocates two hex strings and re-parses them base-16 per row, in the
  * hot path of every decoded-key operator (the feature compactions
  * decode EVERY event's key on both the event and deletion sides; the
  * summary/point/slice relations per entry). These expressions read the
  * bytes directly — one static call inside whole-stage codegen (SURVEY
  * §2.10 tier (b)), no intermediate strings.
  *
  * Value-equality with the builtin forms — including the top-bit-set
  * (negative) domain and the builtins' behavior on SHORT inputs (≤4
  * bytes → null; 5-7 bytes → hi-4 ‖ remaining bytes) — is pinned by
  * spec across input lengths. */
case class BeLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"be_long requires a binary argument, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "be_long"

  override def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.length <= 4) null else BinaryBe.getLong(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.length > 4) {
        ${ev.value} = graft.functions.BinaryBe.getLong($c);
      } else {
        ${ev.isNull} = true;
      }""")

  override protected def withNewChildInternal(newChild: Expression): BeLong =
    copy(child = newChild)
}

/** A long as its 8 big-endian bytes (the stored partition-key
  * encoding) — the native inverse of [[BeLong]]. */
case class BeLongBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"be_long_bytes requires a bigint argument, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "be_long_bytes"

  override def nullSafeEval(k: Any): Any =
    BinaryBe.putLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BinaryBe.putLong($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BeLongBytes =
    copy(child = newChild)
}

object BinaryBe {

  /** Big-endian long of `bytes` exactly as the builtin two-half
    * composition computes it: the first min(4, n) bytes as the high
    * word, bytes 4..min(8, n) as the low word — for n ≥ 8 this is the
    * plain big-endian first-8-bytes read. Caller guarantees n > 4. */
  def getLong(bytes: Array[Byte]): Long = {
    var hi = 0L
    var i = 0
    val hn = math.min(4, bytes.length)
    while (i < hn) { hi = (hi << 8) | (bytes(i) & 0xffL); i += 1 }
    var lo = 0L
    i = 4
    val ln = math.min(8, bytes.length)
    while (i < ln) { lo = (lo << 8) | (bytes(i) & 0xffL); i += 1 }
    (hi << 32) | lo
  }

  /** The 8 big-endian bytes of `k` (negatives in two's complement —
    * identical to `unhex(lpad(hex(k), 16, '0'))`). */
  def putLong(k: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (k >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }
}
