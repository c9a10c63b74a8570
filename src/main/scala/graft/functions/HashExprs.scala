package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level hash kernels shared by the eval and codegen paths of the
  * custom expressions below (and unit-tested directly). Self-contained —
  * no dependency on Spark's internal hash implementations — so document
  * fingerprints are stable across Spark versions.
  */
object GraftHash {

  /** Modulus for the rolling fingerprint: a prime below 2^30, so
    * `h * 31 + byte` stays far from Long overflow. */
  final val FpMod = 1000000007L

  /** Polynomial rolling hash (base 31, mod 1e9+7) over UTF-8 bytes —
    * the document-fingerprint kernel. */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % FpMod; i += 1 }
    h
  }

  /** xxHash64 over UTF-8 bytes, seed 42 — the same function and seed as
    * Spark's `xxhash64` SQL function, so a hash computed here (e.g. the
    * streaming-dedup content hash) agrees with a column computed by
    * `xxhash64(col)` (e.g. the dedup catalog's `secondKey`). Genuinely
    * independent of [[fingerprint64]]: a base-31 polynomial collision
    * carries no information about the xxHash64 values. */
  def xxh64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** FNV-1a 64-bit over UTF-8 bytes — the per-token hash feeding simhash. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xff); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** SimHash over an array of tokens: per-bit majority vote of the tokens'
    * FNV-1a hashes. Near-duplicate token multisets yield signatures within
    * a small Hamming distance. Null tokens are skipped. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** One 64-bit MinHash lane: min over shingles of FNV-1a(seed-prefixed
    * shingle). Seeding by prefix byte-mixing keeps it one pass per lane. */
  def minhashLane(arr: ArrayData, seed: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
        var k = 0
        while (k < bytes.length) { h ^= (bytes(k) & 0xff); h *= 0x100000001b3L; k += 1 }
        if (h < best) best = h
      }
      i += 1
    }
    best
  }

  /** SimHash straight from the text: tokens are maximal runs of
    * non-whitespace bytes (ASCII whitespace — matches `\s+` splitting for
    * the corpora this runs on), each FNV-1a hashed in place; per-bit
    * majority vote as in [[simhash64]]. No token array is materialized. */
  def simhashText(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip whitespace run
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && !isSpace(bytes(i))) {
          h ^= (bytes(i) & 0xff); h *= 0x100000001b3L; i += 1
        }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  /** MinHash signature straight from the text: k lanes over all
    * `shingle`-byte windows of the UTF-8 payload, zero intermediate
    * allocations (no shingle array, no per-shingle strings) — the form
    * that survives a 100 TB scan. Duplicate windows cannot change a min,
    * so no distinct step is needed. Texts shorter than one window hash
    * the whole payload. */
  def minhashTextSignature(s: UTF8String, shingle: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val best = new Array[Long](k)
    java.util.Arrays.fill(best, Long.MaxValue)
    val n = bytes.length
    val windows = if (n <= shingle) 1 else n - shingle + 1
    val winLen = math.min(shingle, n)
    var i = 0
    while (i < windows) {
      var h0 = 0xcbf29ce484222325L
      var b = 0
      while (b < winLen) { h0 ^= (bytes(i + b) & 0xff); h0 *= 0x100000001b3L; b += 1 }
      var lane = 0
      while (lane < k) {
        var z = h0 + lane * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < best(lane)) best(lane) = z
        lane += 1
      }
      i += 1
    }
    ArrayData.toArrayData(best)
  }

  /** Full MinHash signature (k lanes) in ONE pass over the shingle array —
    * the scalable form: cost O(shingles * k) arithmetic but a single
    * traversal, no per-lane re-materialization of the array. */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val best = new Array[Long](k)
    java.util.Arrays.fill(best, Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        // base hash once per shingle, then cheap per-lane remix
        var h0 = 0xcbf29ce484222325L
        var b = 0
        while (b < bytes.length) { h0 ^= (bytes(b) & 0xff); h0 *= 0x100000001b3L; b += 1 }
        var lane = 0
        while (lane < k) {
          // splitmix64-style remix of (h0, lane): avalanches enough for
          // independent-ish lanes at a fraction of k full re-hashes.
          var z = h0 + lane * 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          if (z < best(lane)) best(lane) = z
          lane += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(best)
  }
}

/** `fingerprint64(text)` — rolling-hash document fingerprint as a native
  * Catalyst expression: stays inside whole-stage codegen (the generated
  * code is a single static call), unlike a Scala UDF which breaks the
  * codegen span and pays SerDe per row.
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.fingerprint64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.fingerprint64($c)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
  override def prettyName: String = "fingerprint64"
}

/** `simhash64(tokens)` — SimHash signature of a token array, one pass,
  * codegen-friendly. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `minhash_signature(shingles, k)` — k-lane MinHash signature in one pass
  * over the shingle array. k must be a foldable int literal. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= 512, s"minhash lane count out of range: $k")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.minhashSignature(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.minhashSignature($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** `simhash_text(text)` — SimHash computed directly over the text's
  * whitespace-delimited byte tokens: no token array, codegen'd. Agrees
  * with `simhash64(split(text, whitespace))` on ASCII-whitespace text. */
case class SimHashText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.simhashText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhashText($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
  override def prettyName: String = "simhash_text"
}

/** `minhash_text(text, shingleSize, k)` — MinHash signature computed
  * directly over the text's byte windows: no shingle-array
  * materialization, allocation-free inner loop, codegen'd. Prefer this
  * over `minhash_signature(charShingles(...), k)` on large corpora. */
case class MinHashText(child: Expression, shingleSize: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= 512, s"minhash lane count out of range: $k")
  require(shingleSize > 0 && shingleSize <= 64, s"shingle size out of range: $shingleSize")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.minhashTextSignature(input.asInstanceOf[UTF8String], shingleSize, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.minhashTextSignature($c, $shingleSize, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashText =
    copy(child = newChild)
  override def prettyName: String = "minhash_text"
}
