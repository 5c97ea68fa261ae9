package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark 4
  * hides `Column.expr` behind the sql-api ColumnNode indirection; custom
  * Catalyst expressions (graft.functions) still need the classic
  * conversion, which is only visible from inside the `sql` package.
  */
package object graftbridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
