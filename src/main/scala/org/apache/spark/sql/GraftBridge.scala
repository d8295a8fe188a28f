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

  /** DataFrame over an RDD of InternalRow without the external-Row
    * conversion pass (`createDataFrame(RDD[Row], schema)` re-encodes every
    * field through CatalystTypeConverters — for a string-heavy corpus that
    * is one full decode + re-encode of every doc). Same bridge rationale
    * as above: internalCreateDataFrame is private[sql] on the classic
    * session. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
