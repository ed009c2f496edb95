package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst kernel for the similarity operators' hot path.
  *
  * `aggregate(zip_with(a, b, ...))` evaluates the lambda per element through
  * interpreted HigherOrderFunction plumbing — fine for one row, ruinous for
  * the O(pairs·dims) inner loop of brute-force/LSH cosine scoring. This
  * expression is a tight primitive `long` loop with `doGenCode`, so it stays
  * inside whole-stage codegen (SURVEY §2.10: custom Expression tier beats
  * UDF tier; prompt preference order (b)).
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i64 requires two array<bigint> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  // NULL semantics match the interpreted aggregate/zip_with form this
  // replaces: length mismatch (zip_with pads with null) or a null element
  // makes the whole product NULL.
  override def nullable: Boolean = true

  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    val checkNulls = elementsNullable(left) || elementsNullable(right)
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable(left) || elementsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions.
  *
  * Preferred wiring: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * at session build; [[GraftFunctions.ensureRegistered]] is the idempotent
  * runtime equivalent for sessions built without the extension.
  */
object GraftFunctions {

  val dotI64Descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotI64].getName, "dot_i64"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_i64 requires exactly 2 arguments, got ${children.length}")
        DotI64(children.head, children(1))
      })

  val hash60Descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("portable_h60"),
      new ExpressionInfo(classOf[Hash60].getName, "portable_h60"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"portable_h60 requires exactly 1 argument, got ${children.length}")
        Hash60(children.head)
      })

  val beLongDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("be_long"),
      new ExpressionInfo(classOf[BeLong].getName, "be_long"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"be_long requires exactly 1 argument, got ${children.length}")
        BeLong(children.head)
      })

  val beLongBytesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("be_long_bytes"),
      new ExpressionInfo(classOf[BeLongBytes].getName, "be_long_bytes"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"be_long_bytes requires exactly 1 argument, " +
            s"got ${children.length}")
        BeLongBytes(children.head)
      })

  private val descriptors = Seq(dotI64Descriptor, hash60Descriptor,
    beLongDescriptor, beLongBytesDescriptor)

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptors.foreach { d =>
      if (!reg.functionExists(d._1)) reg.registerFunction(d._1, d._2, d._3)
    }
  }

  /** Column form: exact integer dot product of two `array<bigint>` columns. */
  def dotI64(a: Column, b: Column): Column = call_function("dot_i64", a, b)

  /** Column form of [[Hash60]] (used through [[PortableHash.h60]]). */
  def hash60(c: Column): Column = call_function("portable_h60", c)

  /** Column form of [[BeLong]] (used through
    * [[graft.sources.BinaryKeys.beLong]]). */
  def beLong(c: Column): Column = call_function("be_long", c)

  /** Column form of [[BeLongBytes]] (used through
    * [[graft.sources.BinaryKeys.beLongBytes]]). */
  def beLongBytes(c: Column): Column = call_function("be_long_bytes", c)
}
