package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{MinHasher, Shingles, SimHash64}

/** Catalyst expression computing the dedup signature triple
  * (shingles, minhash, simhash) in ONE pass over the UTF-8 bytes of the
  * input — zero-copy off `UTF8String`'s (base, offset, len), mirroring the
  * reference's zero-copy string hashing (hll/hll_sketch.go:292-295).
  *
  * `doGenCode` emits a plain static call, so the projection stays inside
  * WholeStageCodegen (a Scala UDF would break the span and pay
  * catalyst<->scala conversion on the array outputs).
  */
case class TextSignatureExpr(child: Expression, shingleK: Int, numHashes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = TextSignatureExpr.schema

  override def prettyName: String = "text_signature"

  override def nullSafeEval(input: Any): Any =
    TextSignatureExpr.compute(input.asInstanceOf[UTF8String], shingleK, numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextSignatureExpr.compute($c, $shingleK, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): TextSignatureExpr =
    copy(child = newChild)
}

object TextSignatureExpr {
  val schema: StructType = StructType(Seq(
    StructField("shingles", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("minhash", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("simhash", LongType, nullable = false)))

  // per-JVM MinHasher cache: coefficient tables are deterministic in
  // (numHashes, seed), so tasks share one instance
  private val hashers = new java.util.concurrent.ConcurrentHashMap[(Int, Long), MinHasher]()

  def hasher(n: Int, seed: Long): MinHasher =
    hashers.computeIfAbsent((n, seed), { case (nn, ss) => new MinHasher(nn, ss) })

  /** Called from generated code — must stay public + static-shaped. */
  def compute(s: UTF8String, k: Int, n: Int, seed: Long): InternalRow = {
    val sh = Shingles.shingles(s.getBaseObject, s.getBaseOffset, s.numBytes, k, seed)
    val mh = hasher(n, seed).signature(sh)
    val sim = SimHash64.fingerprint(sh)
    // UnsafeArrayData keeps the primitives unboxed (GenericArrayData on an
    // Array[Long] boxes every element — ~1k Long objects per doc of GC
    // churn in the pipeline's dominant stage)
    InternalRow(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sh),
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mh),
      sim)
  }
}
