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
