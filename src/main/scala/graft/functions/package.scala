package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.GraftBridge

/** Column-level API over the custom Catalyst expressions, plus SQL
  * registration (SURVEY §4.3: expressions registered via functionRegistry /
  * Column(expr) — no custom Rule/Strategy needed for v1). */
package object functions {

  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  /** (shingles array<long>, minhash array<long>, simhash long) in one pass. */
  def text_signature(text: Column, shingleK: Int, numHashes: Int, seed: Long): Column =
    c(TextSignatureExpr(e(text), shingleK, numHashes, seed))

  /** Exact Jaccard of two sorted-distinct array<long> columns. */
  def jaccard_sorted(a: Column, b: Column): Column =
    c(JaccardSortedExpr(e(a), e(b)))

  /** Longest common substring length of two strings. */
  def lcs_length(a: Column, b: Column): Column =
    c(LcsLengthExpr(e(a), e(b)))

  /** Register SQL names (jaccard_sorted, lcs_length, text_signature). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("jaccard_sorted",
      exprs => JaccardSortedExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("lcs_length",
      exprs => LcsLengthExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("text_signature",
      exprs => TextSignatureExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().asInstanceOf[Number].longValue()), "built-in")
  }
}
