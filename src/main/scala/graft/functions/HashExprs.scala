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

  // -------------------------------------------------------------------
  // PORTABLE (oracle-stateable) signature kernels: every step is exact
  // 64-bit integer arithmetic over the base-31 mod-1e9+7 rolling
  // fingerprint, so the whole MinHash/SimHash pipeline can be restated
  // verbatim in DuckDB SQL (the correctness gate) — unlike the
  // FNV/splitmix kernels above, whose 64-bit unsigned mixing has no
  // portable SQL rendering.
  // -------------------------------------------------------------------

  /** splitmix64 — used only DRIVER-side to derive the lane coefficients
    * (the derivation never needs a SQL rendering: the resulting
    * constants are inlined into the oracle as literals). */
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Universal-hash lane coefficients: lane j maps a shingle fingerprint
    * h < FpMod to (LaneA(j) * h + LaneB(j)) % FpMod — exact in 64-bit
    * (a, h < 2^30 so the product stays < 2^60). A in [1, FpMod-1],
    * B in [0, FpMod-1]. */
  final val MaxLanes = 512
  val LaneA: Array[Long] = Array.tabulate(MaxLanes)(j =>
    java.lang.Math.floorMod(splitmix64(0xA11CEL + j), FpMod - 1) + 1)
  val LaneB: Array[Long] = Array.tabulate(MaxLanes)(j =>
    java.lang.Math.floorMod(splitmix64(0xB0BCA7L + j), FpMod))

  /** Portable MinHash signature straight from the text: the shingles are
    * ALL `shingle`-byte windows of the UTF-8 payload, each hashed with
    * the rolling [[fingerprint64]] polynomial (computed incrementally —
    * O(1) per window), then passed through the quadratic premix
    * `g = (h² + h) mod p` ONCE per window; lane j keeps the min of its
    * affine remix of g. Texts shorter than one window hash the whole
    * payload ([[fingerprint64]] semantics, empty text → single shingle 0).
    *
    * The premix is LOAD-BEARING, not hygiene: the rolling fingerprint is
    * linear in the window bytes, so overlapping windows across documents
    * differ by corpus-wide-constant deltas, and an affine lane map
    * preserves those deltas — the per-lane argmin distribution skews onto
    * a few popular shingles and 4-lane band collisions explode
    * quadratically (measured 6.6× the candidate pairs of this premixed
    * form on the sf0.1 corpus, 53 s vs 5 s minhash_20k). One squaring mod
    * p breaks the additive structure at one extra multiply per window,
    * and stays exact signed-64-bit (h < 2^30 ⇒ h² < 2^60) so the oracle
    * restates it verbatim. */
  def minhashFpSignature(s: UTF8String, shingle: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val best = new Array[Long](k)
    java.util.Arrays.fill(best, Long.MaxValue)
    val n = bytes.length
    // 31^(shingle-1) mod FpMod, for rolling the leading byte out
    var pow = 1L
    var p = 1
    while (p < shingle) { pow = pow * 31 % FpMod; p += 1 }
    var h = 0L
    var i = 0
    val winLen = math.min(shingle, n)
    while (i < winLen) { h = (h * 31 + (bytes(i) & 0xff)) % FpMod; i += 1 }
    var win = 0
    val windows = if (n <= shingle) 1 else n - shingle + 1
    while (win < windows) {
      val g = (h * h + h) % FpMod
      var lane = 0
      while (lane < k) {
        val v = (LaneA(lane) * g + LaneB(lane)) % FpMod
        if (v < best(lane)) best(lane) = v
        lane += 1
      }
      if (win + 1 < windows) {
        // roll: drop bytes(win), add bytes(win + shingle)
        val out = (bytes(win) & 0xff) * pow % FpMod
        h = ((h - out + FpMod) % FpMod * 31 + (bytes(win + shingle) & 0xff)) % FpMod
      }
      win += 1
    }
    ArrayData.toArrayData(best)
  }

  /** The distinct SET of premixed window fingerprints — the exact shingle
    * universe [[minhashFpSignature]]'s lanes minimize over, materialized
    * for EXACT Jaccard verification of LSH candidate pairs. Same rolling
    * window + quadratic premix arithmetic (a doc's set is identical to
    * what its signature estimated), deduplicated and sorted ascending so
    * the output is deterministic and restatable as
    * `list_sort(list_distinct(...))` in any engine. Bounded by the text's
    * byte length; the premix keeps values < FpMod < 2^30. */
  def shingleFpSet(s: UTF8String, shingle: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val windows = if (n <= shingle) 1 else n - shingle + 1
    val raw = new Array[Long](windows)
    var pow = 1L
    var p = 1
    while (p < shingle) { pow = pow * 31 % FpMod; p += 1 }
    var h = 0L
    var i = 0
    val winLen = math.min(shingle, n)
    while (i < winLen) { h = (h * 31 + (bytes(i) & 0xff)) % FpMod; i += 1 }
    var win = 0
    while (win < windows) {
      raw(win) = (h * h + h) % FpMod
      if (win + 1 < windows) {
        val out = (bytes(win) & 0xff) * pow % FpMod
        h = ((h - out + FpMod) % FpMod * 31 + (bytes(win + shingle) & 0xff)) % FpMod
      }
      win += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedupe of the sorted run
    var w = 0
    var r = 0
    while (r < windows) {
      if (r == 0 || raw(r) != raw(r - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(raw, w))
  }

  /** Second independent rolling fingerprint (base 37, same modulus) —
    * paired with [[fingerprint64]] to build the 60-bit portable SimHash
    * token hash. Base-31 and base-37 polynomial collisions are
    * independent events for non-trivial inputs. */
  def fingerprint37(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 37 + (bytes(i) & 0xff)) % FpMod; i += 1 }
    h
  }

  /** Portable SimHash over a token array: per token the 60-bit hash is
    * fingerprint64 (bits 0-29) | fingerprint37 << 30 (bits 30-59); the
    * signature is the per-bit majority vote over tokens. Null tokens are
    * skipped; empty tokens hash to 0 (both fingerprints' empty edge). */
  final val SimhashFpBits = 60
  def simhashFp(arr: ArrayData): Long = {
    val votes = new Array[Int](SimhashFpBits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = fingerprint64(t) | (fingerprint37(t) << 30)
        var j = 0
        while (j < SimhashFpBits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < SimhashFpBits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
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

  /** 60-bit fingerprints of every `w`-token window of the text, in
    * position order: element i (0-based) is the window starting at token
    * i+1 of [[TextKernels.tokenizeWs]]'s array. Each window's value is
    * `fingerprint64(join) | fingerprint37(join) << 30` where `join` is
    * the window's tokens joined by a single space — the same 60-bit
    * pairing as [[simhashFp]], so a cross-window collision needs BOTH
    * independent polynomials to collide (corpus-scale safe where a bare
    * 30-bit fingerprint would birthday-collide in ~50 k windows).
    * Restatable in any SQL engine as two fold-hashes over the UTF-8
    * bytes of `concat_ws(' ', toks[i : i+w-1])`.
    *
    * Computed from prefix hashes over the space-joined token stream —
    * O(bytes) total work per document, not O(windows × w) string
    * re-hashing. Texts with fewer than `w` tokens yield an empty array
    * (no window, never a short-text whole-doc hash: unlike the shingle
    * kernels this feeds span REMOVAL, where a whole-short-doc
    * pseudo-window would delete entire documents). */
  def tokenWindowFps(s: UTF8String, w: Int): ArrayData = {
    val toks = TextKernels.tokenizeWs(s)
    val n = toks.numElements()
    if (n < w) return ArrayData.toArrayData(Array.empty[Long])
    // space-joined stream: token bytes with single 0x20 separators
    val tokBytes = new Array[Array[Byte]](n)
    var total = n - 1 // the separators
    var t = 0
    while (t < n) {
      val b = toks.getUTF8String(t).getBytes
      tokBytes(t) = b
      total += b.length
      t += 1
    }
    // prefix hashes H[k] over the first k stream bytes and pow tables,
    // both polynomial bases, all arithmetic mod FpMod in longs; off(t)
    // is the stream offset of token t's first byte (past its separator)
    val h31 = new Array[Long](total + 1)
    val h37 = new Array[Long](total + 1)
    val p31 = new Array[Long](total + 1)
    val p37 = new Array[Long](total + 1)
    p31(0) = 1L; p37(0) = 1L
    val off = new Array[Int](n)
    var k = 0
    t = 0
    while (t < n) {
      if (t > 0) { // separator byte precedes every token but the first
        val c = ' '.toInt
        h31(k + 1) = (h31(k) * 31 + c) % FpMod
        h37(k + 1) = (h37(k) * 37 + c) % FpMod
        p31(k + 1) = p31(k) * 31 % FpMod
        p37(k + 1) = p37(k) * 37 % FpMod
        k += 1
      }
      off(t) = k
      val b = tokBytes(t)
      var i = 0
      while (i < b.length) {
        val c = b(i) & 0xff
        h31(k + 1) = (h31(k) * 31 + c) % FpMod
        h37(k + 1) = (h37(k) * 37 + c) % FpMod
        p31(k + 1) = p31(k) * 31 % FpMod
        p37(k + 1) = p37(k) * 37 % FpMod
        k += 1
        i += 1
      }
      t += 1
    }
    val windows = n - w + 1
    val out = new Array[Long](windows)
    var wi = 0
    while (wi < windows) {
      val b = off(wi)
      val last = wi + w - 1
      val e = off(last) + tokBytes(last).length
      val len = e - b
      val f31 = java.lang.Math.floorMod(h31(e) - h31(b) * p31(len) % FpMod, FpMod)
      val f37 = java.lang.Math.floorMod(h37(e) - h37(b) * p37(len) % FpMod, FpMod)
      out(wi) = f31 | (f37 << 30)
      wi += 1
    }
    ArrayData.toArrayData(out)
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

/** `minhash_fp(text, shingleSize, k)` — the PORTABLE MinHash signature
  * ([[GraftHash.minhashFpSignature]]): rolling base-31 mod-1e9+7 shingle
  * fingerprints with affine per-lane remixes, exactly restatable in
  * DuckDB SQL (the oracle gate states the full LSH pipeline over it).
  * Codegen'd single-pass byte walk like `minhash_text`. */
case class MinHashFp(child: Expression, shingleSize: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= GraftHash.MaxLanes, s"minhash lane count out of range: $k")
  require(shingleSize > 0 && shingleSize <= 64, s"shingle size out of range: $shingleSize")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.minhashFpSignature(input.asInstanceOf[UTF8String], shingleSize, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.minhashFpSignature($c, $shingleSize, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashFp =
    copy(child = newChild)
  override def prettyName: String = "minhash_fp"
}

/** `simhash_fp(tokens)` — the PORTABLE SimHash ([[GraftHash.simhashFp]]):
  * 60-bit per-token hash from the two independent rolling fingerprints,
  * per-bit majority vote. Token array input so the tokenizer is the
  * oracle-proven `tokenize_ws` kernel. */
case class SimHashFp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.simhashFp(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhashFp($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
  override def prettyName: String = "simhash_fp"
}

/** `shingle_fp_set(text, shingleSize)` — the sorted distinct premixed
  * window-fingerprint set ([[GraftHash.shingleFpSet]]): the exact shingle
  * universe behind the portable MinHash signatures, for exact-Jaccard
  * verification of candidate pairs. Codegen'd single static call. */
case class ShingleFpSet(child: Expression, shingleSize: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(shingleSize > 0 && shingleSize <= 64, s"shingle size out of range: $shingleSize")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.shingleFpSet(input.asInstanceOf[UTF8String], shingleSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.shingleFpSet($c, $shingleSize)")
  override protected def withNewChildInternal(newChild: Expression): ShingleFpSet =
    copy(child = newChild)
  override def prettyName: String = "shingle_fp_set"
}

/** `token_window_fps(text, w)` — the 60-bit PORTABLE fingerprint of every
  * `w`-token window ([[GraftHash.tokenWindowFps]]), position-ordered so
  * `posexplode` recovers (window start, fp) pairs for substring-level
  * dedup. Prefix-hash computation, codegen'd single static call. */
case class TokenWindowFps(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w > 0 && w <= 512, s"window token count out of range: $w")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.tokenWindowFps(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.tokenWindowFps($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): TokenWindowFps =
    copy(child = newChild)
  override def prettyName: String = "token_window_fps"
}
