package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
