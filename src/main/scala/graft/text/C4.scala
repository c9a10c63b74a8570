package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published C4 page-cleaning recipe (Raffel et al. 2020, §2.2 —
  * the heuristic set behind the C4 corpus), as one composable stage.
  * Line rules, applied first:
  *
  *   - keep only lines ending in a terminal punctuation mark
  *     (`.` `!` `?` or a closing quote);
  *   - keep only lines with at least `minWordsPerLine` (5) words;
  *   - drop any line containing the word "javascript".
  *
  * Page rules, over the ORIGINAL page (the paper discards the whole
  * page on these, before/independent of the line pass) plus the kept
  * text's sentence count:
  *
  *   - drop pages whose KEPT text has fewer than `minSentences` (3)
  *     sentences;
  *   - drop pages containing any word on the bad-word list
  *     ([[WordBlocklist]] — the same normalized-token membership);
  *   - drop pages containing the phrase "lorem ipsum" (lowercased);
  *   - drop pages containing a curly bracket.
  *
  * Deterministic definitions where the paper is informal (stated here
  * because the oracle restates them): lines are `\n`-splits evaluated
  * TRIMMED (trailing spaces must not defeat the terminal-punctuation
  * rule); a word is a whitespace token; the sentence count is the
  * number of `.` `!` `?` characters in the kept text. The span-dedup
  * step of the paper is deliberately NOT here — that is the substring
  * tier's job ([[graft.dedup]]), already composable before/after this.
  *
  * Everything is pure column work — zero shuffles, scales as a scan;
  * compose it before [[graft.streaming.StreamingCurate]]'s writer the
  * way the paper runs it before dedup. */
object C4 {

  /** Terminal-punctuation rule (trimmed line): `.` `!` `?` `"` `'`. */
  private val TerminalRe = "[.!?\"']$"

  /** Kept-lines array after all three LINE rules. */
  def keptLines(text: Column, minWordsPerLine: Int = 5): Column =
    filter(transform(split(text, "\n", -1), l => trim(l)), l =>
      l.rlike(TerminalRe) &&
        graft.functions.GraftFunctions.tokenCountWs(l) >= minWordsPerLine &&
        !arrays_overlap(WordBlocklist.uniTokens(l),
          array(lit("javascript"))))

  /** The line-cleaned page text (kept lines rejoined in order). */
  def cleanText(text: Column, minWordsPerLine: Int = 5): Column =
    array_join(keptLines(text, minWordsPerLine), "\n")

  /** Sentence count of a (kept) text: occurrences of `.` `!` `?`. */
  def sentenceCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?]", ""))).cast("int")

  /** The page-level keep predicate over (original page, kept text). */
  def pageKept(original: Column, kept: Column, badWords: Seq[String],
      minSentences: Int = 3): Column =
    sentenceCount(kept) >= minSentences &&
      !WordBlocklist.docBlocked(original, badWords) &&
      !lower(original).contains("lorem ipsum") &&
      !original.contains("{") && !original.contains("}")

  /** The full recipe: pages that survive, with their line-cleaned
    * text in `textCol` (other columns untouched). */
  def clean(df: DataFrame, textCol: String, badWords: Seq[String] = Nil,
      minSentences: Int = 3, minWordsPerLine: Int = 5): DataFrame = {
    val kept = cleanText(col(textCol), minWordsPerLine)
    df.withColumn("__c4_kept", kept)
      .filter(pageKept(col(textCol), col("__c4_kept"), badWords, minSentences))
      .withColumn(textCol, col("__c4_kept"))
      .drop("__c4_kept")
  }
}
