package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scan tokenization kernels. The hot scalar of every text-quality
  * query is `split(trim(text), "\\s+")`: Spark's `StringSplit` delegates to
  * `UTF8String.split`, which RECOMPILES the regex per row — at corpus
  * scale the scan spends more time in `Pattern.compile` than in the data.
  * These kernels walk the UTF-8 bytes once with zero regex and (for the
  * counting forms) zero allocation, while reproducing the Java-regex
  * semantics EXACTLY so every existing DuckDB oracle stays bit-identical:
  *
  *  - `trim` strips ASCII space (0x20) only — Spark's `trim` semantics.
  *  - separators are runs of Java `\s` = `[ \t\n\f\r]` (ASCII only;
  *    NBSP etc. are NOT separators, matching Java regex).
  *  - Spark's `split(str, regex)` calls Java split with limit = -1, which
  *    keeps BOTH the leading and the trailing empty token when the string
  *    starts/ends with a separator (after the space-only trim, a leading
  *    or trailing TAB does exactly that): `"\tfoo\t"` → `["", "foo", ""]`
  *    and `"\t"` → `["", ""]`.
  *
  * All separator bytes are < 0x80, and UTF-8 continuation bytes are
  * ≥ 0x80, so the byte walk never splits inside a multi-byte character.
  */
object TextKernels {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  /** [start, end) after stripping ASCII spaces only — `trim` parity. */
  @inline private def trimmedRange(bytes: Array[Byte]): (Int, Int) = {
    var start = 0
    var end = bytes.length
    while (start < end && bytes(start) == ' ') start += 1
    while (end > start && bytes(end - 1) == ' ') end -= 1
    (start, end)
  }

  /** `split(trim(s), "\\s+")` with the blank→empty-array guard — the exact
    * array [[graft.text.TextOps.tokens]] used to build via regex. */
  def tokenizeWs(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val (start, end) = trimmedRange(bytes)
    if (start >= end) return ArrayData.toArrayData(Array.empty[UTF8String])
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = start
    if (isWs(bytes(i))) { // leading separator ⇒ empty first token (limit -1)
      out += UTF8String.EMPTY_UTF8
      while (i < end && isWs(bytes(i))) i += 1
      if (i >= end) out += UTF8String.EMPTY_UTF8 // that run was also trailing
    }
    while (i < end) {
      val ts = i
      while (i < end && !isWs(bytes(i))) i += 1
      out += UTF8String.fromBytes(bytes, ts, i - ts)
      if (i < end) { // separator run after the token
        while (i < end && isWs(bytes(i))) i += 1
        if (i >= end) out += UTF8String.EMPTY_UTF8 // trailing separator run
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Token count, allocation-free: `size(tokenizeWs(s))` without the array. */
  def tokenCountWs(s: UTF8String): Int = {
    val bytes = s.getBytes
    val (start, end) = trimmedRange(bytes)
    if (start >= end) return 0
    var n = 0
    var i = start
    if (isWs(bytes(i))) {
      n += 1
      while (i < end && isWs(bytes(i))) i += 1
      if (i >= end) n += 1
    }
    while (i < end) {
      n += 1
      while (i < end && !isWs(bytes(i))) i += 1
      if (i < end) {
        while (i < end && isWs(bytes(i))) i += 1
        if (i >= end) n += 1
      }
    }
    n
  }

  /** DISTINCT token count — `size(array_distinct(tokenizeWs(s)))` with
    * exact string equality (UTF8String equals/hashCode), one pass. */
  def distinctTokenCountWs(s: UTF8String): Int = {
    val bytes = s.getBytes
    val (start, end) = trimmedRange(bytes)
    if (start >= end) return 0
    val seen = new java.util.HashSet[UTF8String]()
    var i = start
    if (isWs(bytes(i))) {
      seen.add(UTF8String.EMPTY_UTF8)
      while (i < end && isWs(bytes(i))) i += 1
      // a bare separator's trailing empty dedups against the leading one
    }
    while (i < end) {
      val ts = i
      while (i < end && !isWs(bytes(i))) i += 1
      seen.add(UTF8String.fromBytes(bytes, ts, i - ts))
      if (i < end) {
        while (i < end && isWs(bytes(i))) i += 1
        if (i >= end) seen.add(UTF8String.EMPTY_UTF8)
      }
    }
    seen.size
  }

  /** DISTINCT space-joined word-n-gram count over the token list — equal to
    * `size(array_distinct(transform(sequence(0, size-n), i =>
    * concat_ws(" ", slice(tokens, i+1, n)))))`. Returns 0 when the doc has
    * fewer than n tokens (callers guard on total ≤ 0 anyway). Grams are
    * compared as the joined strings, which is exactly what the column
    * formulation deduplicates. */
  def distinctNgramCountWs(s: UTF8String, n: Int): Int = {
    val toks = tokenizeWs(s)
    val cnt = toks.numElements()
    if (cnt < n) return 0
    val arr = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { arr(i) = toks.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i + n <= cnt) {
      var gram = arr(i)
      var j = 1
      while (j < n) { gram = UTF8String.concat(gram, space, arr(i + j)); j += 1 }
      seen.add(gram)
      i += 1
    }
    seen.size
  }

  /** Sum of token CHAR lengths — `aggregate(tokens, 0L, acc + length(t))`
    * without the array. Char counting only inside tokens (multi-byte
    * aware via UTF8String.numChars on the token slice). */
  def sumTokenCharsWs(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (start, end) = trimmedRange(bytes)
    if (start >= end) return 0L
    var sum = 0L
    var i = start
    if (isWs(bytes(i))) { while (i < end && isWs(bytes(i))) i += 1 }
    while (i < end) {
      val ts = i
      while (i < end && !isWs(bytes(i))) i += 1
      sum += UTF8String.fromBytes(bytes, ts, i - ts).numChars()
      while (i < end && isWs(bytes(i))) i += 1
    }
    sum
  }

  /** Count of non-overlapping occurrences of `needle` in `hay`, scanning
    * left to right and advancing past each match — identical to the
    * `(length(hay) − length(regexp_replace(hay, quote(needle), ""))) /
    * length(needle)` trick for a literal pattern, with zero rewrites.
    * Byte-level search is exact on well-formed UTF-8 (continuation bytes
    * cannot start a character, so no false positives). Empty needle → 0. */
  def countSubstr(hay: UTF8String, needle: UTF8String): Long = {
    val h = hay.getBytes
    val nd = needle.getBytes
    if (nd.length == 0 || h.length < nd.length) return 0L
    var count = 0L
    var i = 0
    val last = h.length - nd.length
    while (i <= last) {
      var j = 0
      while (j < nd.length && h(i + j) == nd(j)) j += 1
      if (j == nd.length) { count += 1; i += nd.length } else i += 1
    }
    count
  }

  /** Word n-grams as space-joined strings, straight from the bytes —
    * the shingling kernel behind decontamination and the n-gram census.
    * `distinct = true` reproduces
    * `array_distinct(transform(sequence(...), concat_ws(" ", slice(tokens))))`
    * (first-occurrence order, exact string equality); `false` keeps every
    * gram in document order. Fewer-than-n-token docs yield the
    * space-joined whole token list (the wordShingles degrade contract). */
  def wordNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokenizeWs(s)
    val cnt = toks.numElements()
    val arr = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { arr(i) = toks.getUTF8String(i); i += 1 }
    joinNgrams(arr, n, distinct)
  }

  /** Space-join a token array into its n-grams (shared tail of
    * [[wordNgrams]] and [[normWordNgrams]] — the degrade contract lives
    * here: fewer-than-n tokens yield ONE element, the space-join of the
    * whole list, empty token list → [""]). */
  private def joinNgrams(arr: Array[UTF8String], n: Int,
      distinct: Boolean): ArrayData = {
    val cnt = arr.length
    val space = UTF8String.fromString(" ")
    if (cnt < n) {
      var joined = if (cnt == 0) UTF8String.EMPTY_UTF8 else arr(0)
      var j = 1
      while (j < cnt) { joined = UTF8String.concat(joined, space, arr(j)); j += 1 }
      return ArrayData.toArrayData(Array(joined))
    }
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](cnt - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i + n <= cnt) {
      var gram = arr(i)
      var j = 1
      while (j < n) { gram = UTF8String.concat(gram, space, arr(i + j)); j += 1 }
      if (seen == null || seen.add(gram)) out += gram
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  @inline private def isAsciiAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** NORMALIZED word n-grams — the decontamination shingling kernel.
    * Tokens are maximal runs of ASCII ALPHANUMERIC bytes, lowercased
    * bytewise (A–Z → a–z); every other byte — punctuation, whitespace,
    * and any non-ASCII byte — is a separator. This is the published
    * decontamination normalization (GPT-3 appendix C; PaLM; Llama 2:
    * lowercase + punctuation strip + whitespace collapse before n-gram
    * matching) realized as one allocation-light byte scan, so "The
    * capital of France." and "the capital of france" fingerprint to the
    * SAME grams and a reformatted eval answer cannot evade the registry.
    * The ASCII-only fold is deliberate: it is exactly restatable in the
    * oracle (split on `[^a-zA-Z0-9]+`, lower each pure-ASCII token) with
    * no Unicode case-mapping divergence between engines; non-ASCII text
    * contributes no grams on either side. Degrade contract identical to
    * [[wordNgrams]] (fewer than n tokens → the whole join; none → [""]).
    * UTF-8 continuation bytes are ≥ 0x80, so treating every non-ASCII
    * byte as a separator never splits a token — multi-byte characters
    * are separators wholesale. */
  def normWordNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val end = bytes.length
    val toks = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < end) {
      while (i < end && !isAsciiAlnum(bytes(i))) i += 1
      if (i < end) {
        val ts = i
        while (i < end && isAsciiAlnum(bytes(i))) i += 1
        val len = i - ts
        val tb = new Array[Byte](len)
        var j = 0
        while (j < len) {
          val b = bytes(ts + j)
          tb(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        toks += UTF8String.fromBytes(tb)
      }
    }
    joinNgrams(toks.toArray, n, distinct)
  }

  /** CJK-family script test for [[uniWordNgrams]]: Han, Hiragana,
    * Katakana, Hangul — the scripts that write words without
    * separators, so run-tokenization would glue a whole sentence into
    * one token and n-gram matching would degenerate to exact-sentence
    * matching. The fast path skips the binary-search script lookup for
    * everything below U+1100 (the first Hangul Jamo — Latin, Cyrillic,
    * Greek, Arabic, Hebrew, all digits). */
  @inline private def isCjkScript(cp: Int): Boolean =
    cp >= 0x1100 && {
      val sc = Character.UnicodeScript.of(cp)
      (sc eq Character.UnicodeScript.HAN) ||
        (sc eq Character.UnicodeScript.HIRAGANA) ||
        (sc eq Character.UnicodeScript.KATAKANA) ||
        (sc eq Character.UnicodeScript.HANGUL)
    }

  /** UNICODE-normalized word n-grams — the MULTILINGUAL decontamination
    * shingling kernel (the [[normWordNgrams]] discipline with the ASCII
    * fold widened to the full letter/digit space, so non-Latin eval text
    * registers real grams instead of none):
    *
    *  - tokens are maximal runs of code points where
    *    `Character.isLetterOrDigit` (Unicode categories L* + Nd) —
    *    EXCEPT that Han / Hiragana / Katakana / Hangul code points are
    *    emitted as SINGLETON tokens (those scripts write without word
    *    separators; per-character tokens make the n-gram window a
    *    character shingle there, the published practice for CJK overlap
    *    matching — a whole-run token would need an exact full-sentence
    *    match and punctuation reflow would break even that);
    *  - every token code point is folded through the SIMPLE per-code-
    *    point lowercase mapping (`Character.toLowerCase(int)` — the
    *    UnicodeData single mapping, NOT `String.toLowerCase`'s full
    *    mapping), which is exactly what DuckDB's utf8proc-backed
    *    `lower()` applies, so the oracle restates the fold verbatim:
    *    `lower(text)`, isolate CJK with a `\p{Han}…` regexp_replace,
    *    extract `[\p{L}\p{Nd}]+` runs. Pinned agreement includes the
    *    İ (U+0130 → i, where the FULL mapping would emit i + U+0307)
    *    and ẞ → ß cases. Honest scope: the two engines read different
    *    Unicode versions (Java 17 = 13.0), so code points whose case
    *    mapping or letter category CHANGED after 13.0 may diverge —
    *    none exist in any testdata or planted gate text.
    *
    * Degrade contract identical to [[wordNgrams]] (fewer than n tokens →
    * the whole join; none → [""], which every consumer filters). */
  def uniWordNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val str = s.toString
    val len = str.length
    val toks = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val cur = new java.lang.StringBuilder()
    @inline def flush(): Unit =
      if (cur.length > 0) {
        toks += UTF8String.fromString(cur.toString); cur.setLength(0)
      }
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (Character.isLetterOrDigit(cp)) {
        if (isCjkScript(cp)) {
          flush()
          val one = new java.lang.StringBuilder(2)
          one.appendCodePoint(Character.toLowerCase(cp))
          toks += UTF8String.fromString(one.toString)
        } else cur.appendCodePoint(Character.toLowerCase(cp))
      } else flush()
      i += Character.charCount(cp)
    }
    flush()
    joinNgrams(toks.toArray, n, distinct)
  }

  /** Code-point split: "abc" → ["a","b","c"] (multi-byte aware; no regex,
    * no trailing-empty quirks). The BPE symbol-initialization step. */
  def splitChars(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val n = Character.charCount(cp)
      out += UTF8String.fromString(str.substring(i, i + n))
      i += n
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** UTF-8 BYTE split as two-uppercase-hex-char symbols: "é" → ["C3",
    * "A9"], "the" → ["74","68","65"] — the BYTE-LEVEL BPE symbol
    * initializer (GPT-2-style byte fallback: every word is first its
    * UTF-8 byte sequence, so NO text is ever out-of-vocabulary and
    * multi-byte characters tokenize as learnable byte merges). The hex
    * alphabet stands in for GPT-2's printable byte↔unicode remap table
    * — both are bijections byte↔symbol whose only job is making byte
    * symbols string-safe; hex additionally makes a merged symbol the
    * hex of its merged byte RUN ("C3"+"A9" → "C3A9"), which is what
    * lets the oracle restate the whole encode over
    * `hex(encode(word))`. */
  def splitBytesHex(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[UTF8String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = UTF8String.fromString(
        new String(Array(HexDigits(b >>> 4), HexDigits(b & 0xf))))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Full BYTE-LEVEL BPE encode of one word: split to hex byte symbols
    * ([[splitBytesHex]]), then the same rank-ordered left-to-right
    * non-overlapping merge fold as [[bpeEncodeWord]]. */
  def bpeEncodeWordBytes(word: UTF8String, merges: Array[UTF8String]): ArrayData = {
    val ad = splitBytesHex(word)
    mergeFold(Array.tabulate(ad.numElements())(ad.getUTF8String), merges)
  }

  /** One BPE merge step over a symbol array: every left-to-right
    * NON-OVERLAPPING adjacent (left, right) occurrence becomes the single
    * symbol left+right — ["a","a","a"] with merge (a,a) → ["aa","a"].
    * The per-iteration apply of the BPE trainer. */
  def bpeMergePair(arr: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr.getUTF8String(i).equals(left) &&
          arr.getUTF8String(i + 1).equals(right)) {
        out += UTF8String.concat(left, right)
        i += 2
      } else {
        out += arr.getUTF8String(i)
        i += 1
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Full BPE encode of one word: split to code points, then apply every
    * learned merge in rank order. `merges` is the flattened [l0, r0, l1,
    * r1, …] pair list. O(merges × len) worst case — the encode pass of
    * the trained tokenizer. */
  def bpeEncodeWord(word: UTF8String, merges: Array[UTF8String]): ArrayData = {
    val ad = splitChars(word)
    mergeFold(Array.tabulate(ad.numElements())(ad.getUTF8String), merges)
  }

  /** The shared encode fold: `merges` flattened [l0, r0, l1, r1, …],
    * applied in rank order, each as one left-to-right non-overlapping
    * pass. */
  private def mergeFold(init: Array[UTF8String],
      merges: Array[UTF8String]): ArrayData = {
    var syms = init
    var m = 0
    while (m < merges.length) {
      val l = merges(m); val r = merges(m + 1)
      if (syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[UTF8String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i).equals(l) && syms(i + 1).equals(r)) {
            out += UTF8String.concat(l, r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      m += 2
    }
    ArrayData.toArrayData(syms)
  }

  /** Count of chars belonging to an ASCII class (the punctuation counters).
    * Class membership via a 128-slot lookup built once per expression. */
  def countAsciiClass(s: UTF8String, mask: Array[Boolean]): Long = {
    val bytes = s.getBytes
    var count = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && mask(b)) count += 1
      i += 1
    }
    count
  }
}

/** `tokenize_ws(text)` — whitespace tokenization (`split(trim(s), "\\s+")`
  * parity) as a single codegen'd byte scan: no per-row regex compile. */
case class TokenizeWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenizeWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenizeWs($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
  override def prettyName: String = "tokenize_ws"
}

/** `token_count_ws(text)` — token count with zero allocation. */
case class TokenCountWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCountWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenCountWs($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenCountWs =
    copy(child = newChild)
  override def prettyName: String = "token_count_ws"
}

/** `distinct_token_count_ws(text)` — distinct-token count in one pass. */
case class DistinctTokenCountWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TextKernels.distinctTokenCountWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.distinctTokenCountWs($c)")
  override protected def withNewChildInternal(newChild: Expression): DistinctTokenCountWs =
    copy(child = newChild)
  override def prettyName: String = "distinct_token_count_ws"
}

/** `word_ngrams(text, n)` — space-joined word n-grams from one byte scan
  * (distinct or full sequence per the constructor flag). */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && n <= 32, s"ngram size out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.wordNgrams(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.wordNgrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

/** `norm_word_ngrams(text, n)` — normalized (lowercased, punctuation-
  * stripped) word n-grams from one byte scan; the decontamination
  * shingle ([[TextKernels.normWordNgrams]]). */
case class NormWordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && n <= 32, s"ngram size out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.normWordNgrams(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.normWordNgrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): NormWordNgrams =
    copy(child = newChild)
  override def prettyName: String = "norm_word_ngrams"
}

/** `uni_word_ngrams(text, n)` — UNICODE-normalized word n-grams (full
  * letter/digit tokenization, simple-mapping lowercase, CJK singleton
  * tokens); the MULTILINGUAL decontamination shingle
  * ([[TextKernels.uniWordNgrams]]). */
case class UniWordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && n <= 32, s"ngram size out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.uniWordNgrams(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.uniWordNgrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): UniWordNgrams =
    copy(child = newChild)
  override def prettyName: String = "uni_word_ngrams"
}

/** `distinct_ngram_count_ws(text, n)` — distinct word-n-gram count. */
case class DistinctNgramCountWs(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && n <= 32, s"ngram size out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TextKernels.distinctNgramCountWs(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.distinctNgramCountWs($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): DistinctNgramCountWs =
    copy(child = newChild)
  override def prettyName: String = "distinct_ngram_count_ws"
}

/** `sum_token_chars_ws(text)` — total chars across tokens, no array. */
case class SumTokenCharsWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.sumTokenCharsWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.sumTokenCharsWs($c)")
  override protected def withNewChildInternal(newChild: Expression): SumTokenCharsWs =
    copy(child = newChild)
  override def prettyName: String = "sum_token_chars_ws"
}

/** `count_substr(hay, needle)` — non-overlapping literal occurrence count
  * (the language-ID marker counter) without regexp_replace rewrites. */
case class CountSubstr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(hay: Any, needle: Any): Any =
    TextKernels.countSubstr(hay.asInstanceOf[UTF8String], needle.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n) => s"graft.functions.TextKernels.countSubstr($h, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountSubstr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "count_substr"
}

/** `count_ascii_class(text)` for a fixed ASCII char class — the
  * punctuation counters as one masked byte scan. The class string is a
  * constructor parameter (not a child), so the mask builds once. */
case class CountAsciiClass(child: Expression, chars: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(chars.nonEmpty && chars.forall(_ < 128), "class must be non-empty ASCII")
  @transient private lazy val mask: Array[Boolean] = CountAsciiClass.maskOf(chars)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.countAsciiClass(input.asInstanceOf[UTF8String], mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maskRef = ctx.addReferenceObj("asciiClassMask", mask, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.countAsciiClass($c, $maskRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountAsciiClass =
    copy(child = newChild)
  override def prettyName: String = "count_ascii_class"
}

object CountAsciiClass {
  private[functions] def maskOf(chars: String): Array[Boolean] = {
    val m = new Array[Boolean](128)
    chars.foreach(c => m(c.toInt) = true)
    m
  }
}

/** `split_chars(text)` — code-point split, the BPE symbol initializer. */
case class SplitChars(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.splitChars(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.splitChars($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitChars =
    copy(child = newChild)
  override def prettyName: String = "split_chars"
}

/** One BPE merge pass over a symbol array column. The (left, right) pair
  * is a constructor constant — a new expression per training iteration,
  * inlined into codegen as static references. */
case class BpeMergePair(child: Expression, mergeLeft: String, mergeRight: String)
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val l = UTF8String.fromString(mergeLeft)
  @transient private lazy val r = UTF8String.fromString(mergeRight)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeMergePair(input.asInstanceOf[ArrayData], l, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", l, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeRight", r, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeMergePair($c, $lRef, $rRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
  override def prettyName: String = "bpe_merge_pair"
}

/** Full trained-BPE encode of one word (merge list applied in rank order). */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val flat: Array[UTF8String] =
    merges.flatMap { case (l, r) => Seq(l, r) }
      .map(UTF8String.fromString).toArray
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeWord(input.asInstanceOf[UTF8String], flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", flat, s"${classOf[UTF8String].getName}[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeEncodeWord($c, $mRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_word"
}

/** `split_bytes_hex(text)` — UTF-8 byte split as hex-pair symbols, the
  * BYTE-LEVEL BPE symbol initializer ([[TextKernels.splitBytesHex]]). */
case class SplitBytesHex(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.splitBytesHex(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.splitBytesHex($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitBytesHex =
    copy(child = newChild)
  override def prettyName: String = "split_bytes_hex"
}

/** Full BYTE-LEVEL BPE encode of one word (hex byte symbols + the merge
  * list in rank order) — the GPT-2-style byte-fallback encode. */
case class BpeEncodeWordBytes(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val flat: Array[UTF8String] =
    merges.flatMap { case (l, r) => Seq(l, r) }
      .map(UTF8String.fromString).toArray
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeEncodeWordBytes(input.asInstanceOf[UTF8String], flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeByteMerges", flat,
      s"${classOf[UTF8String].getName}[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.bpeEncodeWordBytes($c, $mRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWordBytes =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode_word_bytes"
}

/** Unicode NFC normalization kernel + expression. Training corpora mix
  * composed and decomposed encodings of the same grapheme (crawl sources,
  * OCR, macOS-origin NFD filenames leaking into text), which defeats
  * exact dedup, shingle hashing and token counting — canonical
  * composition is the standard first cleaning pass. NFC of assigned
  * codepoints is stable across Unicode versions (the normalization
  * stability policy), so the JDK's normalizer and any other compliant
  * engine (DuckDB's `nfc_normalize`, ICU) agree — the oracle restates
  * this verbatim. */
object UnicodeKernels {
  /** NFC-normalize. ASCII fast path: a pure-ASCII payload is already NFC
    * by construction, so the dominant corpus case skips the
    * String round-trip entirely (zero allocation). */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm eq str) s else UTF8String.fromString(norm)
    }
  }
}

/** `normalize_nfc(text)` — Unicode canonical composition
  * ([[UnicodeKernels.nfc]]) as a codegen'd static call. */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
  override def prettyName: String = "normalize_nfc"
}
