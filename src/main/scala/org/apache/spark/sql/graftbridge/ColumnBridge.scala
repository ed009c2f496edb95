package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 moved `Column` to the connect-agnostic sql-api module; the
  * classic-backend converters (`ExpressionUtils.column/expression`) are
  * `private[sql]`. Custom expressions that cannot go through the function
  * registry — e.g. [[graft.functions.ClfScoreBcast]], whose constructor
  * carries a `Broadcast` handle rather than child expressions — still need
  * a Column wrapper, so this one-file subpackage of `org.apache.spark.sql`
  * re-exports the two converters. No Spark internals are reimplemented or
  * modified here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
