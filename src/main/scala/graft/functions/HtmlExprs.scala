package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML text extraction. [[graft.text.Html]]'s reference
  * formulation is a six-stage `regexp_replace`/`replace` chain — each
  * stage allocates a full copy of every document, so a 100 TB corpus pays
  * six materializations per page. This kernel walks the UTF-8 bytes ONCE
  * with one output buffer (never longer than the input) and no regex:
  * script/style/comment skipping, tag stripping, entity decoding and
  * whitespace collapsing all ride the same scan.
  *
  * Semantics match the reference chain exactly on well-formed markup and
  * on every truncation edge (unterminated tag/opener/comment stays
  * literal, unclosed script/style loses only its opener — each pinned in
  * HtmlSpec). The one DELIBERATE divergence: crossed script/style/comment
  * pairs (invalid HTML, e.g. `<style>..<script>..</style>..</script>`)
  * resolve left-to-right here, while the sequential chain resolves
  * scripts-globally-first. Real pages never cross them; the parity
  * property in HtmlSpec generates realistic (non-crossed) soup.
  *
  * Byte-walk safety: every byte the scanner dispatches on (`<`, `&`, `>`,
  * whitespace, ASCII letters) is < 0x80, and UTF-8 continuation bytes are
  * >= 0x80, so multi-byte characters pass through untouched.
  */
object HtmlKernels {

  private val Script = "script".getBytes
  private val ScriptClose = "</script>".getBytes
  private val Style = "style".getBytes
  private val StyleClose = "</style>".getBytes

  /** Java `\s` (the collapse stage's separator class): ASCII only. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  @inline private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b.toInt

  /** Case-insensitive match of lowercase `lit` at `at` (tag names). */
  private def matchesIc(b: Array[Byte], at: Int, lit: Array[Byte]): Boolean = {
    if (at + lit.length > b.length) return false
    var i = 0
    while (i < lit.length) {
      if (lower(b(at + i)) != lit(i)) return false
      i += 1
    }
    true
  }

  private def indexOfIc(b: Array[Byte], from: Int, lit: Array[Byte]): Int = {
    var i = math.max(from, 0)
    val last = b.length - lit.length
    while (i <= last) {
      if (matchesIc(b, i, lit)) return i
      i += 1
    }
    -1
  }

  private def indexOfByte(b: Array[Byte], from: Int, c: Byte): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == c) return i
      i += 1
    }
    -1
  }

  /** Exact (case-sensitive, like the reference `replace` chain) entity
    * match at `&`; returns (length << 8) | decoded byte, or -1. */
  private def matchEntity(b: Array[Byte], i: Int): Int = {
    val n = b.length
    @inline def is(s: String): Boolean = {
      if (i + s.length > n) return false
      var k = 1 // b(i) == '&' already known
      while (k < s.length) {
        if (b(i + k) != s.charAt(k)) return false
        k += 1
      }
      true
    }
    if (is("&nbsp;")) (6 << 8) | ' '
    else if (is("&lt;")) (4 << 8) | '<'
    else if (is("&gt;")) (4 << 8) | '>'
    else if (is("&quot;")) (6 << 8) | '"'
    else if (is("&#39;")) (5 << 8) | '\''
    else if (is("&amp;")) (5 << 8) | '&'
    else -1
  }

  def extractHtmlText(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new Array[Byte](n)
    var o = 0
    var pending = false // a separator run awaits the next text byte
    @inline def emit(c: Byte): Unit = {
      if (pending && o > 0) { out(o) = ' '; o += 1 }
      pending = false
      out(o) = c
      o += 1
    }
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '<') {
        if (matchesIc(b, i + 1, Script)) {
          // opener is <script[^>]*> — anything up to the first '>'
          val g = indexOfByte(b, i + 1 + Script.length, '>')
          if (g < 0) { emit('<'); i += 1 } // unterminated opener: literal
          else {
            val close = indexOfIc(b, g + 1, ScriptClose)
            pending = true
            // no closer: the opener alone strips (chain stage d), body stays
            i = if (close < 0) g + 1 else close + ScriptClose.length
          }
        } else if (matchesIc(b, i + 1, Style)) {
          val g = indexOfByte(b, i + 1 + Style.length, '>')
          if (g < 0) { emit('<'); i += 1 }
          else {
            val close = indexOfIc(b, g + 1, StyleClose)
            pending = true
            i = if (close < 0) g + 1 else close + StyleClose.length
          }
        } else if (i + 3 < n && b(i + 1) == '!' && b(i + 2) == '-' && b(i + 3) == '-') {
          // <!-- ... --> ; unclosed comment stays literal text
          var close = -1
          var k = i + 4
          while (close < 0 && k + 2 < n) {
            if (b(k) == '-' && b(k + 1) == '-' && b(k + 2) == '>') close = k
            k += 1
          }
          if (close < 0) { emit('<'); i += 1 }
          else { pending = true; i = close + 3 }
        } else {
          // generic tag: optional '/', a letter, then up to the first '>'
          var j = i + 1
          if (j < n && b(j) == '/') j += 1
          if (j < n && isAlpha(b(j))) {
            val g = indexOfByte(b, j + 1, '>')
            if (g < 0) { emit('<'); i += 1 } // unterminated: literal
            else { pending = true; i = g + 1 }
          } else { emit('<'); i += 1 } // "a < b", "<3", "</ x>"
        }
      } else if (c == '&') {
        val e = matchEntity(b, i)
        if (e < 0) { emit('&'); i += 1 }
        else {
          val ch = (e & 0xff).toByte
          if (ch == ' ') pending = true else emit(ch)
          i += (e >>> 8)
        }
      } else if (isWs(c)) { pending = true; i += 1 }
      else { emit(c); i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** `extract_html_text(html)` — the full boilerplate-removal scalar as one
  * codegen'd byte scan; see [[HtmlKernels.extractHtmlText]]. */
case class ExtractHtmlText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HtmlKernels.extractHtmlText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernels.extractHtmlText($c)")
  override protected def withNewChildInternal(newChild: Expression): ExtractHtmlText =
    copy(child = newChild)
  override def prettyName: String = "extract_html_text"
}
