package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ↔ Expression converters —
  * the supported extension-point shape for native expressions since the
  * Spark 4 Column/ColumnNode split (ExpressionUtils lives in
  * org.apache.spark.sql.classic with private[sql] access, so the shim
  * must sit inside the org.apache.spark.sql package tree).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
