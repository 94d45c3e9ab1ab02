package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private classic Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql] in Spark 4's
  * Column-API split). Standard extension-library pattern: a shim compiled
  * inside the org.apache.spark.sql namespace re-exporting the two
  * conversions our custom Catalyst expressions need.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
