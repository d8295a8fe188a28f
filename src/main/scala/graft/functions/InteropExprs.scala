package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.sketch.interop.DataSketchesHll

/** ds_hll_estimate(binary) — cardinality estimate of an Apache
  * DataSketches HLL image (Java/C++/Go `.sk` bytes, any mode/encoding),
  * using the reference estimator chain (HIP / composite interpolation /
  * coupon mapping). Lets a corpus of externally-generated sketches be
  * queried — and joined against the engine's own hll_agg results —
  * without a re-count over the raw data. */
case class DsHllEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ds_hll_estimate"

  override def nullSafeEval(v: Any): Any =
    DataSketchesHll.estimate(DataSketchesHll.read(v.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sketch.interop.DataSketchesHll.estimate(graft.sketch.interop.DataSketchesHll.read($c))")

  override protected def withNewChildInternal(c: Expression): DsHllEstimate =
    copy(child = c)
}

/** hll_from_ds(binary) — convert an Apache DataSketches HLL image into the
  * engine's own sketch image, so external sketches flow into hll_merge_agg
  * / hll_estimate / hll_bounds like any Spark-built sketch (cross-language
  * union without touching raw data). */
case class HllFromDs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_from_ds"

  override def nullSafeEval(v: Any): Any =
    graft.sketch.HllSketch.fromDataSketchesImage(v.asInstanceOf[Array[Byte]]).serialize()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sketch.HllSketch.fromDataSketchesImage($c).serialize()")

  override protected def withNewChildInternal(c: Expression): HllFromDs =
    copy(child = c)
}

/** kll_to_ds(binary) — export an engine KLL doubles image (kll_sketch_agg
  * output) as an Apache DataSketches KllDoublesSketch compact image, so a
  * Spark job can feed quantile sketches to existing Java/C++ consumers
  * (the write-side half of the doubles interop; strings go through
  * KllItemsSketch.toDataSketchesImage). */
case class KllToDs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_to_ds"

  override def nullSafeEval(v: Any): Any =
    graft.sketch.KllSketch.deserialize(v.asInstanceOf[Array[Byte]]).toDataSketchesImage

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sketch.KllSketch.deserialize($c).toDataSketchesImage()")

  override protected def withNewChildInternal(c: Expression): KllToDs =
    copy(child = c)
}

/** kll_from_ds(binary) — import an Apache DataSketches KllDoublesSketch
  * compact image into the engine's own image, so externally-built quantile
  * sketches flow into kll_quantiles / kll_rank / kll_merge like any
  * Spark-built sketch. Exact state transfer, no replay. */
case class KllFromDs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_from_ds"

  override def nullSafeEval(v: Any): Any =
    graft.sketch.interop.DataSketchesKll.readDoubles(v.asInstanceOf[Array[Byte]])
      .toEngine.serialize()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sketch.interop.DataSketchesKll.readDoubles($c).toEngine().serialize()")

  override protected def withNewChildInternal(c: Expression): KllFromDs =
    copy(child = c)
}
