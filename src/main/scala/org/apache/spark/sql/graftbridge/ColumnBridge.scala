package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public `Column.expr` / `Column(expr)`; the blessed
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. This bridge (placed inside the
  * `org.apache.spark.sql` namespace, the conventional extension-point
  * technique) re-exports just the two conversions the engine needs to
  * expose custom Catalyst expressions as `Column`s.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
