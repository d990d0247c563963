package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column↔Expression bridge (`classic.ExpressionUtils`)
  * private[sql]; extensions that define custom Catalyst expressions need
  * it, so expose the two conversions from inside the package — the
  * standard extension-library idiom.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
