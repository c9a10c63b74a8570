package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WordBlocklistSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("normalize: tokenizer-fold parity, punctuation-only entries dropped, dedupe") {
    assert(WordBlocklist.normalize(Seq("BadWord", "bad-word", "!!!", "ŻÓŁĆ", "badword"))
      == Seq("badword", "żółć"))
    // "bad-word" folds to "badword" (the tokenizer would never produce a
    // hyphenated token, so keeping the hyphen would make the entry dead)
  }

  test("doc-level: normalized TOKEN membership, never substring (no Scunthorpe)") {
    val df = Seq(
      1L -> "a perfectly classic sentence", // 'ass' in 'classic': NOT a token
      2L -> "contains ASS, with noise", // case+punct noise still matches
      3L -> "clean text entirely",
      4L -> "multi 中文 script").toDF("id", "text")
    val words = Seq("ass", "中")
    val blocked = df.filter(WordBlocklist.docBlocked(col("text"), words))
      .select("id").as[Long].collect().toSet
    // CJK chars are singleton tokens, so blocking "中" matches "中文"
    assert(blocked == Set(2L, 4L))
    // empty list blocks nothing and stays a pure passthrough
    assert(WordBlocklist.filterDocs(df, "text", Nil).count() == 4)
    assert(WordBlocklist.filterDocs(df, "text", Seq("!!")).count() == 4)
  }

  test("line-level: offending lines vanish, order and trailing empties preserved") {
    val text = "keep one\ndrop badword here\nkeep two\n"
    val got = Seq(text).toDF("text")
      .select(
        WordBlocklist.scrubLines(col("text"), Seq("BadWord")).as("c"),
        size(split(col("text"), "\n", -1)).as("n"),
        size(WordBlocklist.keepLines(col("text"), Seq("BadWord"))).as("k"))
      .as[(String, Int, Int)].head()
    assert(got == (("keep one\nkeep two\n", 4, 3)))
    // every line blocked degrades to ""
    val all = Seq("badword\nalso badword").toDF("text")
      .select(WordBlocklist.scrubLines(col("text"), Seq("badword")))
      .as[String].head()
    assert(all == "")
  }

  test("fromList collapses a config-table list to the literal path") {
    val bl = Seq("Alpha", "beta!", "alpha", null).toDF("word")
    assert(WordBlocklist.fromList(bl).sorted == Seq("alpha", "beta"))
  }

  test("filter plan is map-side only: zero shuffle exchanges") {
    val df = Seq(1L -> "some text here", 2L -> "blocked badword row")
      .toDF("id", "text")
    val kept = WordBlocklist.filterDocs(df, "text", Seq("badword"))
    val exchanges = kept.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "word blocklist must not shuffle the corpus")
    assert(kept.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("StreamingCurate stage: doc-level drops before the tiers, line-level rewrites before fingerprinting") {
    val root = java.nio.file.Files.createTempDirectory("graft-wordblock-curate")
    val tmp = root.toString
    def cfg(extra: graft.streaming.StreamingCurate.CurateConfig =>
        graft.streaming.StreamingCurate.CurateConfig) = extra(
      graft.streaming.StreamingCurate.CurateConfig(
        s"$tmp/exact", s"$tmp/near", s"$tmp/substr",
        "doc_id", "text", w = 5, jaccardThreshold = 0.8))
    val batch = Seq(
      10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "this doc carries badword and more words here",
      12L -> "keep me\nline with badword inside\nand keep me too")
      .toDF("doc_id", "text")
    // doc-level: doc 11 and 12 both carry the word → dropped whole
    val out1 = graft.streaming.StreamingCurate.applyBatch(
      batch, cfg(_.copy(wordBlocklist = Seq("badword"))), added = 1L)
    assert(out1.select("doc_id").as[Long].collect().toSet == Set(10L))
    // line-level (fresh catalogs): doc 11 degrades to "" (whole text is
    // one blocked line), doc 12 keeps its clean lines
    val root2 = java.nio.file.Files.createTempDirectory("graft-wordblock-curate2")
    val out2 = graft.streaming.StreamingCurate.applyBatch(
      batch, cfg(_.copy(
        exactDir = s"$root2/exact", nearDir = s"$root2/near",
        substrDir = s"$root2/substr",
        wordBlocklist = Seq("badword"), wordBlocklistLineLevel = true)),
      added = 1L)
    val byId = out2.select(col("doc_id"), col("clean_text"))
      .as[(Long, String)].collect().toMap
    // the substring tier's rewrite re-joins tokens with single spaces,
    // so the line boundary survives as a word boundary
    assert(byId(12L) == "keep me and keep me too")
    assert(byId(11L) == "")
    assert(byId(10L) == "alpha beta gamma delta epsilon zeta")
  }
}
