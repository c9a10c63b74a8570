package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-ORDER (Morton) interleaving — the multi-dimensional data-layout
  * kernel behind [[graft.ops.Layout.zorderBy]]: files sorted by the
  * interleaved key cluster BOTH coordinates, so parquet row-group
  * min/max stats prune 2-D box predicates the way a single-column sort
  * prunes 1-D ranges (the layout move Delta/Iceberg ship as OPTIMIZE
  * ZORDER; Morton 1966). Pure bit arithmetic, codegen'd, no allocation.
  */
object ZOrderKernels {

  /** Coordinates must fit 31 unsigned bits: bit 30 of `b` lands at key
    * bit 61, keeping the key non-negative so SIGNED long ordering (what
    * Spark's range partitioner and parquet stats use) equals the
    * z-curve order. Larger domains should be rank-bucketed first. */
  val MaxCoord: Long = (1L << 31) - 1

  /** Spread the low 31 bits of `v` to the even bit positions (classic
    * magic-mask doubling). */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** The 62-bit Morton key of `(a, b)` — a's bits at even positions,
    * b's at odd. Callers guarantee range (the expression nulls). */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  /** Per-dimension coordinate width for a k-dim key, chosen so the key
    * NEVER reaches bit 63: signed long ordering must equal curve
    * ordering (the 2-D invariant, generalized). 3 dims × 21 bits tops
    * out at bit 62; 4 dims use 15 bits (not 16 — 4 × 16 puts dim 3's
    * top bit on the SIGN bit and negative keys would sort before the
    * origin, scrambling the curve). */
  def bitsForDims(dims: Int): Int = dims match {
    case 2 => 31
    case 3 => 21
    case 4 => 15
    case d => throw new IllegalArgumentException(
      s"interleave supports 2..4 dimensions, got $d")
  }
  def maxCoordForDims(dims: Int): Long = (1L << bitsForDims(dims)) - 1

  /** Generic k-stride bit spread: bit i of `v` lands at bit `i * dims`.
    * A plain loop (the magic-mask doubling only exists for stride 2);
    * ≤ 21 iterations, branch-free body, still scan-stage arithmetic. */
  def spreadK(v: Long, dims: Int, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((v >>> i) & 1L) << (i * dims)
      i += 1
    }
    out
  }

  /** The k-dim Morton key: dim d's bits at positions `i * dims + d`.
    * Callers guarantee range (the expression nulls). */
  def interleaveK(vals: Array[Long], dims: Int): Long = {
    val bits = bitsForDims(dims)
    var out = 0L
    var d = 0
    while (d < dims) {
      out |= spreadK(vals(d), dims, bits) << d
      d += 1
    }
    out
  }

  /** Count of sorted `bounds` ≤ v — the rank-bucket assignment against
    * precomputed quantile boundaries (binary search, no allocation). */
  def bucketOf(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/** `interleave_bits(a, b)` → the Morton key of two non-negative 31-bit
  * coordinates; NULL when either is out of range (negative or ≥ 2³¹ —
  * silently masking would scramble the curve, the same null-on-invalid
  * discipline as the decode kernels). */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0L || x > ZOrderKernels.MaxCoord ||
      y < 0L || y > ZOrderKernels.MaxCoord) null
    else ZOrderKernels.interleave(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a < 0L || $a > ${ZOrderKernels.MaxCoord}L ||
          $b < 0L || $b > ${ZOrderKernels.MaxCoord}L) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.functions.ZOrderKernels.interleave($a, $b); }
    """)
  override def prettyName: String = "interleave_bits"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

/** `interleave_bits_k(c1, …, ck)` → the k-dim Morton key (k = 3 or 4;
  * use [[InterleaveBits]] for 2 — its magic-mask spread is cheaper).
  * Coordinates must be non-negative and fit the per-arity width
  * ([[ZOrderKernels.bitsForDims]]: 21 bits at 3 dims, 15 at 4) — NULL
  * otherwise, same null-on-invalid discipline. */
case class InterleaveBitsK(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {
  require(children.size >= 3 && children.size <= 4,
    s"interleave_bits_k takes 3 or 4 coordinates, got ${children.size}")
  private val dims = children.size
  private val maxCoord = ZOrderKernels.maxCoordForDims(dims)
  override def inputTypes: Seq[DataType] = Seq.fill(dims)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      val v = children(d).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      if (x < 0L || x > maxCoord) return null
      vals(d) = x
      d += 1
    }
    ZOrderKernels.interleaveK(vals, dims)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val checks = evals.zipWithIndex.map { case (e, d) =>
      s"""
        if (!${ev.isNull}) {
          ${e.code}
          if (${e.isNull} || ${e.value} < 0L || ${e.value} > ${maxCoord}L) {
            ${ev.isNull} = true;
          } else { $arr[$d] = ${e.value}; }
        }"""
    }.mkString("\n")
    val body =
      s"""
      boolean ${ev.isNull} = false;
      long ${ev.value} = 0L;
      long[] $arr = new long[$dims];
      $checks
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.ZOrderKernels.interleaveK($arr, $dims);
      }"""
    ev.copy(code = code"$body")
  }
  override def prettyName: String = "interleave_bits_k"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBitsK =
    copy(children = newChildren)
}

/** `bucket_by_bounds(v)` → the count of precomputed sorted boundaries
  * ≤ v ([[ZOrderKernels.bucketOf]]) — the CLUSTER-SCALE rank bucketing
  * for [[graft.ops.Layout]]: boundaries come from a one-pass
  * (approximate or exact) quantile aggregate, the per-row assignment is
  * a codegen'd binary search, and no global sort ever happens. NULL in
  * → NULL out. */
case class BucketByBounds(child: Expression, bounds: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(bounds.nonEmpty, "bounds must be non-empty")
  require(bounds.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
    "bounds must be sorted ascending")
  // Seq in the case-class key so two semantically identical expressions
  // compare structurally equal (canonicalization / common-subexpression
  // elimination); the double[] the kernel binary-searches is built once
  @transient private lazy val boundsArr: Array[Double] = bounds.toArray
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ZOrderKernels.bucketOf(input.asInstanceOf[Double], boundsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundsArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ZOrderKernels.bucketOf($c, $ref)")
  }
  override def prettyName: String = "bucket_by_bounds"
  override protected def withNewChildInternal(newChild: Expression): BucketByBounds =
    copy(child = newChild)
}
