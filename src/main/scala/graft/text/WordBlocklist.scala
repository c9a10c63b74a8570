package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-blocklist filtering — the C4 "bad words" curation stage
  * (Raffel et al. 2020 §2.2 drop any page containing a listed word;
  * Dolma and RefinedWeb ship the same stage with a line-level variant
  * that drops only the offending LINES). The URL-side twin is
  * [[UrlOps]]' domain blocklist; together they are the two published
  * list-driven filters of a web-curation pipeline.
  *
  * Matching is NORMALIZED-TOKEN membership, not substring: a token is a
  * maximal letter/digit code-point run folded through the simple
  * per-code-point lowercase mapping, with Han/Hiragana/Katakana/Hangul
  * characters as singleton tokens ([[TextOps.uniWordShingles]] at
  * n = 1 — the same tokenizer the decontamination tier fingerprints
  * with, so "what counts as a word" cannot drift between the two
  * list-driven text stages). Substring matching is deliberately NOT
  * offered — the classic Scunthorpe false positive is a token-boundary
  * bug, and C4's published rule is word membership.
  *
  * Scale shape: the word list (hundreds of entries per language in the
  * published lists) compiles into the scan as a codegen'd in-set over
  * the token array — a pure map-side filter, ZERO shuffles, no join,
  * no broadcast variable to manage. A list too large to inline that
  * way is not a word blocklist any more (it is a document classifier);
  * the [[fromList]] convenience still collects a small DataFrame list
  * to the driver for config-table callers.
  */
object WordBlocklist {

  /** The blocked-word list normalized through the SAME fold the
    * tokenizer applies (simple per-code-point lowercase) — a list entry
    * like "BadWord" must match the token "badword"; entries that
    * tokenize to nothing (pure punctuation) are dropped rather than
    * silently matching the zero-token degrade gram. */
  def normalize(words: Seq[String]): Seq[String] =
    words.iterator.map { w =>
      val out = new java.lang.StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) out.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      out.toString
    }.filter(_.nonEmpty).toSeq.distinct

  /** Distinct normalized tokens of `text` (the membership surface). */
  def uniTokens(text: Column): Column = TextOps.uniWordShingles(text, 1)

  /** True when any normalized token of `text` is in `words` (the C4
    * drop-the-document predicate). Pure column expression. */
  def docBlocked(text: Column, words: Seq[String]): Column = {
    val ws = normalize(words)
    if (ws.isEmpty) lit(false)
    else arrays_overlap(uniTokens(text), array(ws.map(lit): _*))
  }

  /** C4 semantics: drop every document containing a blocked word. */
  def filterDocs(df: DataFrame, textCol: String, words: Seq[String]): DataFrame =
    if (normalize(words).isEmpty) df
    else df.filter(!docBlocked(col(textCol), words))

  /** The line-level variant's kept-lines array: `text` split on `\n`
    * (trailing empties preserved — a line count is part of the
    * contract), lines containing a blocked token removed. */
  def keepLines(text: Column, words: Seq[String]): Column = {
    val ws = normalize(words)
    if (ws.isEmpty) split(text, "\n", -1)
    else filter(split(text, "\n", -1),
      l => !arrays_overlap(uniTokens(l), array(ws.map(lit): _*)))
  }

  /** Line-level (Dolma/RefinedWeb) semantics: the text with blocked
    * LINES removed, remaining lines rejoined in order. A document whose
    * every line is blocked degrades to "" — filter on emptiness
    * downstream if full drops are wanted too. */
  def scrubLines(text: Column, words: Seq[String]): Column =
    array_join(keepLines(text, words), "\n")

  /** Blocklist rows (one `word` column) → the literal list: word lists
    * are driver-small by construction (see the object doc), so a
    * config-table list collapses to the same zero-shuffle in-set path
    * instead of forcing an explode + anti-join over the corpus. */
  def fromList(blocklist: DataFrame): Seq[String] =
    normalize(blocklist.select(col("word").cast("string"))
      .na.drop().distinct().collect().map(_.getString(0)).toSeq)
}
