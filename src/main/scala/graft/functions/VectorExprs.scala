package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Allocation-free vector kernels over quantized code arrays (shared by
  * the eval and codegen paths of [[QuantizedCosine]]). */
object VectorKernels {

  /** Fused dequantize + cosine over two int8 code arrays: one
    * left-to-right loop accumulating dot product and both norms — NO
    * intermediate arrays. Bit-identical to the compositional
    * `cosine(dequantize(a), dequantize(b))` column pipeline it replaces
    * (pinned in QuantizeSpec): per element `v = (q + 128.0)·step + lo`
    * (same double ops, same order), accumulation left-to-right, final
    * `dot / (√na · √nb)` with the same zero-norm guard.
    *
    * Returns null (boxed) when lengths mismatch the codebook or an
    * element is null — the same rows the HOF pipeline nulled out. */
  def quantizedCosine(
      a: ArrayData, b: ArrayData,
      lo: Array[Double], step: Array[Double]): java.lang.Double = {
    val n = lo.length
    if (a.numElements != n || b.numElements != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val va = (a.getByte(i) + 128.0) * step(i) + lo(i)
      val vb = (b.getByte(i) + 128.0) * step(i) + lo(i)
      dot += va * vb
      na += va * va
      nb += vb * vb
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }
}

/** Element accessor indirection for float-or-double arrays: both sides of
  * a similarity op can independently be `array<float>` (stored vectors)
  * or `array<double>` (centroid/hyperplane literals), and floats read as
  * `(double) f` — the same widening the HOF pipelines' `cast(DoubleType)`
  * performed per element. */
trait ArrayNumKernels {
  @inline protected final def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

object VectorKernelsF extends ArrayNumKernels {

  /** Fused deterministic dot product — same left-to-right accumulation of
    * per-element double products as `aggregate(zip_with(a, b, x·y))`, so
    * results are bit-identical to the HOF formulation (pinned in
    * SimilaritySpec). Null when lengths mismatch or an element is null
    * (the rows the HOF pipeline nulled out). */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements
    if (b.numElements != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elem(a, aF, i) * elem(b, bF, i)
      i += 1
    }
    s
  }

  /** Fused cosine: dot and both norms in ONE pass, `√na·√nb` with the
    * zero-norm guard — bit-identical to
    * `when(nn === 0, 0).otherwise(dot/nn)` over the HOF dot/norm columns. */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements
    if (b.numElements != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val va = elem(a, aF, i)
      val vb = elem(b, bF, i)
      dot += va * vb
      na += va * va
      nb += vb * vb
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }
}

/** Shared shape of the fused binary vector ops: two float-or-double array
  * children, double out, null-tolerant. */
abstract class FusedVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  protected def kernelName: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = (isFloatArr(left), isFloatArr(right))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Box =
        graft.functions.VectorKernelsF.$kernelName($a, $af, $b, $bf);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.doubleValue(); }
    """)
  }
}

/** `vec_dot(a, b)` — fused deterministic double dot product. */
case class VecDot(left: Expression, right: Expression) extends FusedVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsF.dot(a.asInstanceOf[ArrayData], isFloatArr(left),
      b.asInstanceOf[ArrayData], isFloatArr(right))
  override protected def kernelName: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — fused deterministic cosine similarity. */
case class VecCosine(left: Expression, right: Expression) extends FusedVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsF.cosine(a.asInstanceOf[ArrayData], isFloatArr(left),
      b.asInstanceOf[ArrayData], isFloatArr(right))
  override protected def kernelName: String = "cosine"
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** `quantized_cosine(a, b)` — cosine similarity of two int8-quantized
  * embedding columns, dequantizing in-register against the per-dimension
  * (lo, step) codebook embedded at construction. Replaces a 7-HOF column
  * pipeline (2×2 `zip_with` dequantize, `zip_with`+`aggregate` dot, two
  * `transform`+`aggregate` norms) that allocated ~7 arrays per scored
  * pair — the reason the quantized scan was slower than the float one at
  * compute-bound scales despite reading 4× fewer bytes. */
case class QuantizedCosine(
    left: Expression, right: Expression,
    lo: Array[Double], step: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.quantizedCosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lo, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("qcosLo", lo, "double[]")
    val stepRef = ctx.addReferenceObj("qcosStep", step, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Box =
        graft.functions.VectorKernels.quantizedCosine($a, $b, $loRef, $stepRef);
      if (${ev.value}Box == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Box.doubleValue(); }
    """)
  }

  override def prettyName: String = "quantized_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}
