package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter kernels over 64-bit key hashes. Double hashing (Kirsch &
  * Mitzenmacher 2006): probe i uses `h1 + i·h2` where h1 is the key hash
  * and h2 a splitmix64 remix forced odd — k probes from one hash, no
  * per-probe rehashing. Bit array is `Array[Long]` words.
  */
object BloomKernels {

  def splitmixOdd(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  def insert(bits: Array[Long], numBits: Int, k: Int, hash: Long): Unit = {
    val h2 = splitmixOdd(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(hash + i * h2, numBits).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], numBits: Int, k: Int, hash: Long): Boolean = {
    val h2 = splitmixOdd(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(hash + i * h2, numBits).toInt
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) | b(i); i += 1 }
    out
  }

  /** Bits for a target false-positive rate: m = −n·ln(p)/ln(2)², rounded
    * up to a whole word; k = (m/n)·ln(2). */
  def optimalBits(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing: n=$n fpp=$fpp")
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    (((m.toLong max 64L) + 63L) / 64L * 64L).min(Int.MaxValue.toLong - 63).toInt
  }

  def optimalK(numBits: Long, n: Long): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)
}

/** `bloom_might_contain(hash)` — membership probe against a fixed bit
  * array (a broadcast-sized reference object, shipped once per task via
  * the codegen references, not per row). */
case class BloomMightContain(child: Expression, numBits: Int, k: Int, bits: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(bits, numBits, k, input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernels.mightContain($bRef, $numBits, $k, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
