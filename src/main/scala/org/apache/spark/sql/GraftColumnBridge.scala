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

  /** Eager ColumnNode→Catalyst conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper, which only the Dataset API converts;
    * an expression spliced into a SQL plan by an analyzer/optimizer rule
    * must be real Catalyst immediately (the SQL analyzer has no
    * ColumnNode rule and fails with `columnnodeexpression()` otherwise).
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
