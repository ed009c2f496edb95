package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of [[PortableHash.h60]].
  *
  * The builtin composition `conv(substring(md5(s),1,15),16,10)` is
  * value-identical but materializes a 32-char hex string, slices it, and
  * re-parses it base-16 — three allocations per call, per row, in the hot
  * path of every hash-keyed operator (SimHash votes one hash per token
  * occurrence; MinHash one per shingle). This expression digests the
  * UTF8String bytes and reads the first 60 bits straight off the md5 output
  * (big-endian first 8 bytes >>> 4 == parseLong(first 15 hex chars, 16)),
  * one static call inside whole-stage codegen (SURVEY §2.10 tier (b)).
  *
  * Value-equality with the builtin form, the driver form and the DuckDB
  * fragment is pinned by `ExtensionsSpec` and the q22/q23/q29/q54 oracle.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_h60 requires a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_h60"

  override def nullSafeEval(s: Any): Any =
    Hash60.compute(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): big-endian first 8 digest bytes >>> 4 —
    * bit-identical to parsing the 15-hex-char prefix. */
  def compute(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val be =
      (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
        (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
        (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
    be >>> 4
  }
}
