package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class C4Spec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def cleanOf(text: String, bad: Seq[String] = Nil): Option[String] = {
    val out = C4.clean(Seq(1L -> text).toDF("doc_id", "text"), "text", bad)
      .select("text").collect()
    out.headOption.map(_.getString(0))
  }

  test("line rules: terminal punctuation (incl. quotes), min words, javascript token") {
    val page = Seq(
      "a fine sentence with plenty of words here.",
      "ends with a question mark does it not?",
      "a quoted sentence can end like \"this\"",
      "trailing spaces must not defeat the rule.   ",
      "too short.",
      "no terminal punctuation on this line at all",
      "the javascript widget is described in this line.",
      "but javascripting as a longer token survives fine here.").mkString("\n")
    val kept = Seq(page).toDF("text")
      .select(C4.keptLines(col("text"))).as[Seq[String]].head()
    assert(kept == Seq(
      "a fine sentence with plenty of words here.",
      "ends with a question mark does it not?",
      "a quoted sentence can end like \"this\"",
      "trailing spaces must not defeat the rule.",
      // 'javascript' is TOKEN membership, not substring — the Scunthorpe
      // discipline shared with WordBlocklist
      "but javascripting as a longer token survives fine here."))
  }

  test("page rules: sentence floor, bad word, lorem ipsum (case-insensitive), curly bracket") {
    val goodLines =
      "one proper sentence sits right here.\n" +
        "another proper sentence follows it closely!\n" +
        "a third one seals the sentence floor?"
    assert(cleanOf(goodLines).contains(goodLines))
    // only two sentences kept -> page dropped
    assert(cleanOf(
      "one proper sentence sits right here.\n" +
        "another proper sentence follows it closely!").isEmpty)
    // bad word anywhere on the ORIGINAL page drops it
    assert(cleanOf(goodLines + "\nforbidden darkmagic here",
      bad = Seq("darkmagic")).isEmpty)
    // the bad-word line itself wouldn't survive the line pass — the
    // page still drops (page rules see the original)
    assert(cleanOf(goodLines + "\nLorem IPSUM dolor").isEmpty)
    assert(cleanOf(goodLines + "\ncurly { anywhere").isEmpty)
    assert(cleanOf(goodLines.replace("follows", "fol}lows")).isEmpty)
  }

  test("sentenceCount counts . ! ? in kept text; clean() rewrites textCol and keeps other columns") {
    val n = Seq("a. b! c? d\" e'").toDF("t")
      .select(C4.sentenceCount(col("t"))).as[Int].head()
    assert(n == 3)
    val df = Seq((7L, "src9",
      "first proper sentence with enough words here.\n" +
        "second proper sentence with enough words too!\n" +
        "third proper sentence finishes the page now?")).toDF("id", "source", "text")
    val out = C4.clean(df, "text").collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L && out(0).getString(1) == "src9")
    assert(out(0).getString(2).linesIterator.size == 3)
  }

  test("plan is map-side only: zero shuffle exchanges") {
    val df = Seq(1L -> "a proper sentence with enough words here.").toDF("id", "text")
    val out = C4.clean(df, "text", Seq("bad"))
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "the C4 recipe must scale as a pure scan")
  }
}
