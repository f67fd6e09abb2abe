package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed to expose custom Catalyst
  * expressions as user-facing Columns (Spark 4 hid Column↔Expression
  * conversion behind `classic.ExpressionUtils`). Standard extension-library
  * technique; nothing here touches internals beyond the two conversions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
