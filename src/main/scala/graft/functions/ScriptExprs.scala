package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode SCRIPT census — the corpus-routing primitive of a
  * multilingual pretraining pipeline: before language ID, quality
  * scoring or decontamination-width choices can be made per document,
  * the pipeline needs to know WHICH WRITING SYSTEM a document is in
  * (script detection is cheap, deterministic, and in practice the
  * first routing key — CLD3 and fastText both gate on it). One
  * code-point pass counts the six major script families plus decimal
  * digits and derives the dominant script.
  *
  * The oracle bridge: per-script counts are exactly RE2 script-class
  * character counts (`\p{Latin}`, `\p{Cyrillic}`, … — the same
  * Scripts.txt both engines read, the [[TextKernels.uniWordNgrams]]
  * agreement one property over), and the dominant script is a fixed
  * priority CASE chain over those counts (latin > cyrillic > greek >
  * arabic > hebrew > cjk on ties; "none" when all six are zero). */
object ScriptKernels {

  private val Scripts = Array("latin", "cyrillic", "greek", "arabic",
    "hebrew", "cjk")

  def scriptProfile(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new Array[Int](6)
    var digits = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 0x80) {
        // ASCII fast path: letters are Latin, 0-9 are Nd
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) counts(0) += 1
        else if (cp >= '0' && cp <= '9') digits += 1
      } else {
        if (Character.getType(cp) == Character.DECIMAL_DIGIT_NUMBER)
          digits += 1
        val sc = Character.UnicodeScript.of(cp)
        if (sc eq Character.UnicodeScript.LATIN) counts(0) += 1
        else if (sc eq Character.UnicodeScript.CYRILLIC) counts(1) += 1
        else if (sc eq Character.UnicodeScript.GREEK) counts(2) += 1
        else if (sc eq Character.UnicodeScript.ARABIC) counts(3) += 1
        else if (sc eq Character.UnicodeScript.HEBREW) counts(4) += 1
        else if ((sc eq Character.UnicodeScript.HAN) ||
          (sc eq Character.UnicodeScript.HIRAGANA) ||
          (sc eq Character.UnicodeScript.KATAKANA) ||
          (sc eq Character.UnicodeScript.HANGUL)) counts(5) += 1
      }
      i += Character.charCount(cp)
    }
    // dominant: first script (in the fixed priority order) whose count
    // is >= every other — the CASE-chain rule the oracle restates
    var dom = "none"
    var best = 0
    var k = 0
    while (k < 6) {
      if (counts(k) > best) { best = counts(k); dom = Scripts(k) }
      k += 1
    }
    InternalRow(counts(0), counts(1), counts(2), counts(3), counts(4),
      counts(5), digits, UTF8String.fromString(dom))
  }
}

/** `script_profile(text)` → `struct<n_latin int, n_cyrillic int,
  * n_greek int, n_arabic int, n_hebrew int, n_cjk int, n_digit int,
  * dominant string>` — one codegen'd code-point pass
  * ([[ScriptKernels.scriptProfile]]). */
case class ScriptProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_latin", IntegerType, nullable = false),
    StructField("n_cyrillic", IntegerType, nullable = false),
    StructField("n_greek", IntegerType, nullable = false),
    StructField("n_arabic", IntegerType, nullable = false),
    StructField("n_hebrew", IntegerType, nullable = false),
    StructField("n_cjk", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("dominant", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    ScriptKernels.scriptProfile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ScriptKernels.scriptProfile($c)")

  override def prettyName: String = "script_profile"

  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)
}
