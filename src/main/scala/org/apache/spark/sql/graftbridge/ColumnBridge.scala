package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters so the
  * engine can lift its custom Catalyst expressions into the public
  * Column API (the standard extension-jar pattern; Spark 4's Column is
  * a connect-compatible wrapper, so direct construction is gone).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
