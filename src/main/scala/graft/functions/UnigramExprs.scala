package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A unigram-LM piece vocabulary with its log-probabilities, plus the
  * VITERBI segmenter over it — the inference half of the SentencePiece
  * unigram model (Kudo 2018, "Subword Regularization"): segment a word
  * into the piece sequence maximizing Σ log p(piece).
  *
  * Determinism contract (the oracle depends on every clause):
  *  - scores accumulate LEFT TO RIGHT along a segmentation (the DP adds
  *    `prefixScore + logp` in position order), so a path's double score
  *    is a pure function of its piece sequence — DuckDB's enumeration
  *    of the same path sums the same doubles in the same order and gets
  *    the same bits;
  *  - EXACT score ties break to the lexicographically SMALLEST
  *    separator-joined path (pieces prefixed with U+0001 and
  *    concatenated). Two distinct segmentations of the same prefix
  *    first differ at a position where one has the separator and the
  *    other a word character, so the comparison is decided strictly
  *    inside the shared region and the (max score, lex-min path)
  *    objective keeps optimal substructure — the DP tiebreak is the
  *    global tiebreak, and `ORDER BY score DESC, path ASC` restates it.
  *
  * Returns null for an unsegmentable word (some character outside the
  * single-character vocabulary) — callers route those to their unknown
  * handling. Pieces must not contain U+0001 (they come from word
  * characters). */
final class UnigramVocab(val pieces: Array[String], val logps: Array[Double])
    extends Serializable {
  require(pieces.length == logps.length,
    s"pieces/logps length mismatch: ${pieces.length} vs ${logps.length}")
  require(pieces.forall(_.nonEmpty), "empty vocabulary piece")
  require(pieces.forall(!_.contains('\u0001')),
    "vocabulary piece contains the U+0001 path separator")

  /** UTF-8 BYTE order (= code-point order) — what DuckDB's binary
    * `ORDER BY path ASC` compares. Java `String.compareTo` is UTF-16
    * code-UNIT order, which sorts supplementary-plane characters
    * (surrogates 0xD800–DFFF) BEFORE U+E000.. BMP characters and would
    * diverge from the oracle on exact ties between such pieces. */
  private def utf8Compare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  @transient private lazy val byFirst: Map[Char, Array[Int]] =
    pieces.indices.groupBy(i => pieces(i).charAt(0))
      .map { case (c, is) => c -> is.toArray }

  def segment(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val path = new Array[String](n + 1)
    score(0) = 0.0
    path(0) = ""
    var i = 0
    while (i < n) {
      if (path(i) != null) {
        byFirst.get(word.charAt(i)).foreach { idxs =>
          var k = 0
          while (k < idxs.length) {
            val pi = idxs(k)
            val p = pieces(pi)
            val j = i + p.length
            if (j <= n && word.startsWith(p, i)) {
              val s = score(i) + logps(pi)
              val pp = path(i) + "\u0001" + p
              if (s > score(j) ||
                (s == score(j) &&
                  (path(j) == null || utf8Compare(pp, path(j)) < 0))) {
                score(j) = s
                path(j) = pp
              }
            }
            k += 1
          }
        }
      }
      i += 1
    }
    if (path(n) == null) null
    else path(n).substring(1).split('\u0001')
  }
}

object UnigramKernels {
  /** Codegen entry: null for null/unsegmentable input. */
  def segmentToArray(vocab: UnigramVocab, word: UTF8String): ArrayData = {
    val segs = vocab.segment(word.toString)
    if (segs == null) null
    else ArrayData.toArrayData(segs.map(UTF8String.fromString))
  }
}

/** `unigram_segment(word)` → array of vocabulary pieces (Viterbi best
  * segmentation; null when unsegmentable). The vocabulary is an
  * expression CONSTANT (bounded, driver-collected — the argmax/limit(1)
  * discipline), keyed on Seqs so identical expressions canonicalize. */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    logps: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.nonEmpty, "empty unigram vocabulary")
  require(pieces.length == logps.length, "pieces/logps length mismatch")

  @transient private lazy val vocab =
    new UnigramVocab(pieces.toArray, logps.toArray)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramKernels.segmentToArray(vocab, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", vocab,
      classOf[UnigramVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}Tmp =
        graft.functions.UnigramKernels.segmentToArray($ref, $c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)
  }

  override def prettyName: String = "unigram_segment"

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
