package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{TokenCountWs, TokenizeWs}

/** Optimizer rule: rewrite regex whitespace tokenization to the byte-scan
  * kernels, so a user writing PLAIN Spark SQL —
  * `split(trim(text), '\\s+')` or `size(split(trim(text), '\\s+'))` —
  * gets the regex-free codegen expression automatically when
  * [[graft.functions.GraftExtensions]] is installed.
  *
  * Safe because the kernels reproduce `StringSplit`'s limit = -1 Java
  * semantics bit-exactly (ScalaCheck-pinned in TextExprsSpec), with ONE
  * deliberate divergence: `TokenizeWs` returns `[]` for blank input where
  * the raw regex split returns `[""]`. The rule therefore only fires on
  * the guarded shape `CASE WHEN length(trim(x)) = 0 THEN array() ELSE
  * split(trim(x), '\s+') END` (what [[graft.text.TextOps.tokens]] and any
  * blank-safe SQL produces) — never on a bare split. The count rewrite
  * handles `size(<guarded shape>)`.
  *
  * Runs in the operator-optimization batch (idempotent, pure expression
  * rewrite — no shape change, so it composes with every other rule).
  */
object TokenizerRewrite extends Rule[LogicalPlan] {

  private val WsPattern = UTF8String.fromString("\\s+")

  /** `split(trim(x), '\s+', -1)` → Some(x). */
  private object RegexWsSplit {
    def unapply(e: Expression): Option[Expression] = e match {
      case StringSplit(StringTrim(x, None), Literal(p: UTF8String, _), Literal(-1, _))
          if p == WsPattern => Some(x)
      case _ => None
    }
  }

  /** The blank-guarded tokenize: CASE WHEN length(trim(x)) = 0 THEN
    * array()/[] ELSE split(trim(x), '\s+') END with matching x. */
  private object GuardedTokens {
    def unapply(e: Expression): Option[Expression] = e match {
      case CaseWhen(Seq((EqualTo(Length(StringTrim(x1, None)), Literal(0, _)), emptyArr)),
          Some(RegexWsSplit(x2)))
          if x1.semanticEquals(x2) && isEmptyStringArray(emptyArr) => Some(x1)
      case _ => None
    }

    private def isEmptyStringArray(e: Expression): Boolean = e match {
      case CreateArray(Seq(), _) => true
      case Cast(CreateArray(Seq(), _), _, _, _) => true
      case Literal(null, _) => false
      case _ => e.foldable && (e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.numElements() == 0
        case _ => false
      })
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=true returns -1 for null input; TokenCountWs
      // returns null — only the modern flag preserves semantics
      case Size(GuardedTokens(x), false) => TokenCountWs(x)
      case GuardedTokens(x) => TokenizeWs(x)
    }
}
