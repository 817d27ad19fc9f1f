package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (the Connect refactor removed the public
  * `Column.expr` / `new Column(expr)` surface). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy that access
  * qualifier — the standard pattern for Spark-native extension
  * libraries that ship custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
