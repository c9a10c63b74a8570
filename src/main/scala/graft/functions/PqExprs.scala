package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): a D-dim vector splits into
  * `m` subvectors of `dsub = D/m` dims; each subvector is encoded as the
  * id of its nearest codebook centroid (k per subspace), so the vector
  * stores as `m` bytes. Query scoring is ASYMMETRIC (ADC): the query
  * stays a float vector, each corpus code looks up the precomputed
  * query-subvector · centroid dot product — one table lookup per
  * subspace instead of dsub multiplies.
  *
  * Codebooks are flat `Array[Double]` reference objects
  * (layout `[sub][centroid][dim]` → `sub*k*dsub + c*dsub + d`) embedded
  * once per expression — tiny (m·k·dsub doubles), no per-row overhead.
  */
object PqKernels {

  /** Loud failure on ragged input: the kernels index `vec` by
    * subspace arithmetic, and UnsafeArrayData does NO bounds checking — a
    * short vector would silently read adjacent row memory and emit
    * plausible-looking garbage codes. */
  @inline private def requireDim(vec: ArrayData, m: Int, dsub: Int): Unit = {
    val n = vec.numElements()
    if (n != m * dsub) throw new IllegalArgumentException(
      s"PQ kernel: vector has $n dims, codebook expects ${m * dsub} ($m×$dsub)")
  }

  /** Encode: per subspace, the argmin-L2 centroid id, stored −128..127. */
  def pqEncode(vec: ArrayData, cents: Array[Double], m: Int, k: Int, dsub: Int): ArrayData = {
    requireDim(vec, m, dsub)
    val codes = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var d = 0
        val base = sub * k * dsub + c * dsub
        while (d < dsub) {
          val diff = vec.getDouble(sub * dsub + d) - cents(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(sub) = (best - 128).toByte
      sub += 1
    }
    ArrayData.toArrayData(codes)
  }

  /** ADC lookup table for one query: lut[sub*k + c] = q_sub · centroid. */
  def pqLut(vec: ArrayData, cents: Array[Double], m: Int, k: Int, dsub: Int): ArrayData = {
    requireDim(vec, m, dsub)
    val lut = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        var dot = 0.0
        var d = 0
        val base = sub * k * dsub + c * dsub
        while (d < dsub) {
          dot += vec.getDouble(sub * dsub + d) * cents(base + d)
          d += 1
        }
        lut(sub * k + c) = dot
        c += 1
      }
      sub += 1
    }
    ArrayData.toArrayData(lut)
  }

  /** ADC score: Σ_sub lut[sub*k + code_sub] ≈ q · v (both normalized ⇒
    * approximate cosine). One lookup per subspace. */
  def pqAdc(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += lut.getDouble(sub * k + (codes.getByte(sub) + 128))
      sub += 1
    }
    s
  }
}

/** `pq_encode(vec)` — m-byte PQ code of a double-array vector. */
case class PqEncode(child: Expression, cents: Array[Double], m: Int, k: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PqKernels.pqEncode(input.asInstanceOf[ArrayData], cents, m, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.pqEncode($c, $cRef, $m, $k, $dsub)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** `pq_lut(query_vec)` — the query's ADC lookup table (m·k doubles). */
case class PqLut(child: Expression, cents: Array[Double], m: Int, k: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PqKernels.pqLut(input.asInstanceOf[ArrayData], cents, m, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.pqLut($c, $cRef, $m, $k, $dsub)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** `pq_adc(codes, lut)` — approximate dot product via table lookups. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ByteType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernels.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqKernels.pqAdc($c, $l, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}
