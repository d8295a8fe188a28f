/*
 * Bridge into Spark's private[sql] Column<->Expression converters.
 * Lives in the org.apache.spark.sql package on purpose — the standard
 * third-party-extension pattern for Spark 4.x, where Column(expr) is no
 * longer public (columnNodeSupport.scala moved it behind classic.*).
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
