package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for Spark 4's column-node API: the
  * classic `Column(expr)` constructor is gone and `ExpressionUtils` (the
  * supported conversion point in the classic backend) is `private[sql]`,
  * so this one-file shim lives under the spark.sql package — the standard
  * pattern for libraries contributing native Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
