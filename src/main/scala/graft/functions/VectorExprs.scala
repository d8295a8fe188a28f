package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.MinHasher

/** Native vector kernels for the similarity-search path. The built-in
  * higher-order functions (zip_with + aggregate) evaluate their lambda per
  * element through the interpreter — measured ~50µs per 64-dim cosine vs
  * <1µs for these tight loops over ArrayData. At millions of candidate
  * pairs that difference is the whole ANN runtime.
  */

/** cosine(a, b) over array<float>/array<double>, computed in double;
  * zero vectors score 0. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // each side keeps its own element type (float corpus vs double
  // centroid literals is the common mix)
  private def sideType(e: Expression): DataType = e.dataType match {
    case ArrayType(FloatType, _) => ArrayType(FloatType)
    case _ => ArrayType(DoubleType)
  }
  private def aFloat = sideType(left) == ArrayType(FloatType)
  private def bFloat = sideType(right) == ArrayType(FloatType)

  override def inputTypes: Seq[DataType] = Seq(sideType(left), sideType(right))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $b, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: vector dimensions differ (${a.numElements()} vs ${b.numElements()}) — " +
          "mixed-dimension embedding corpora are a data error, not a 0-similarity pair")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** srp_keys(embedding) → array<long> of one sign-random-projection bucket
  * key per table. Plane sign for (table, plane, coordinate) comes from a
  * seeded 64-bit mix — deterministic, no stored projection matrix, O(dim ×
  * planes × tables) per row in one pass. */
case class SrpKeys(child: Expression, nPlanes: Int, nTables: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def inputTypes: Seq[DataType] =
    Seq(if (isFloat) ArrayType(FloatType) else ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_keys"

  override def nullSafeEval(v: Any): Any =
    SrpKeys.compute(v.asInstanceOf[ArrayData], nPlanes, nTables, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpKeys.compute($c, $nPlanes, $nTables, ${seed}L, $isFloat)")

  override protected def withNewChildInternal(c: Expression): SrpKeys = copy(child = c)
}

/** word_ngrams(text, n): whitespace-tokenize and emit the n-gram strings
  * (space-joined) in one pass — the native replacement for
  * split + transform(sequence(...), concat_ws(...)), whose interpreted
  * lambda costs ~ms per document. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}

object WordNgrams {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // whitespace tokenization equivalent to trim + split("\\s+")
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) words += s.substring(start, i)
    }
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(j + k))
        k += 1
      }
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** winnow_fingerprints(text, k, w): document fingerprinting by winnowing
  * (Schleimer-Wilkerson-Aiken, SIGMOD'03): the minimum shingle hash of each
  * sliding window of w consecutive k-byte shingles, rightmost-min
  * tie-break, deduplicated + sorted. The standard rolling-hash fingerprint
  * set for plagiarism/near-dup detection; guarantees any match of length
  * ≥ w+k-1 shares a fingerprint. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.compute($c, $k, $w, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

object WinnowFingerprints {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int,
              seed: Long): GenericArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    if (len < k) return new GenericArrayData(Array.emptyLongArray)
    val n = len - k + 1
    // ordered (positional) shingle hashes — winnowing needs the sequence
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = graft.core.Murmur3x128.hash64(base, off + i, k, seed)
      i += 1
    }
    if (n <= w) {
      var m = hs(0); var j = 1
      while (j < n) { if (hs(j) <= m) m = hs(j); j += 1 }
      return new GenericArrayData(Array(m))
    }
    val picks = new Array[Long](n - w + 1)
    var np = 0
    var lastPos = -1
    var p = 0
    while (p <= n - w) {
      // rightmost min of hs[p, p+w)
      var minPos = p
      var j = p + 1
      while (j < p + w) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) {
        picks(np) = hs(minPos); np += 1
        lastPos = minPos
      }
      p += 1
    }
    new GenericArrayData(graft.core.Shingles.sortedDistinct(
      java.util.Arrays.copyOf(picks, np)))
  }
}

object SrpKeys {
  def compute(emb: ArrayData, nPlanes: Int, nTables: Int, seed: Long,
              isFloat: Boolean): GenericArrayData = {
    val dim = emb.numElements()
    val keys = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var p = 0
      while (p < nPlanes) {
        var s = 0.0
        var i = 0
        val planeSeed = seed ^ MinHasher.mix64((t.toLong << 32) | p.toLong)
        while (i < dim) {
          val v = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
          // deterministic ±1 from (planeSeed, i)
          val sign = if ((MinHasher.mix64(planeSeed + i) & 1L) == 0L) 1.0 else -1.0
          s += v * sign
          i += 1
        }
        if (s >= 0) key |= (1L << p)
        p += 1
      }
      keys(t) = key + t.toLong * (1L << nPlanes)
      t += 1
    }
    new GenericArrayData(keys)
  }
}
