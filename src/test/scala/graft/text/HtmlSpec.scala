package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class HtmlSpec extends AnyFunSuite with SparkTestBase {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h"))).head.getString(0)
  }

  test("script/style payloads and comments vanish entirely") {
    val got = extract(
      """<html><head><STYLE media="all">body { color: red; }
        |p > a { x: 1 }</STYLE>
        |<script type="text/javascript">
        |  var leak = "SECRET1"; if (a < b && b > c) {}
        |</script></head><body>kept</body></html>""".stripMargin)
    assert(got == "kept")
  }

  test("tags become spaces (block boundaries never glue words)") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract("<h1 class=\"x\" data-y='z'>title</h1>body") == "title body")
    // self-closing and uppercase
    assert(extract("a<BR/>b<IMG src='x.png'/>c") == "a b c")
  }

  test("entity decode: after tag strip, &amp; last, &amp;lt; stays literal") {
    // a literal &lt;b&gt; in the page text must NOT come back as a tag
    assert(extract("<p>&lt;b&gt;not a tag&lt;/b&gt;</p>") == "<b>not a tag</b>")
    // &amp;lt; means the four characters "&lt;", never "<"
    assert(extract("x &amp;lt; y") == "x &lt; y")
    assert(extract("A&nbsp;B &quot;C&#39;") == "A B \"C'")
  }

  test("bare '<' followed by space or digit is text, not a tag") {
    assert(extract("a < b and c > d") == "a < b and c > d")
    assert(extract("score <3 points") == "score <3 points")
  }

  test("whitespace collapses to single spaces, trimmed") {
    assert(extract("  <div>\n\n  a\t\tb  \n</div>  ") == "a b")
    assert(extract("<div></div>") == "")
  }

  test("property: markup-free text is whitespace-normalized identity") {
    import spark.implicits._
    // all cases ride ONE DataFrame (a Spark job per ScalaCheck case is
    // needlessly slow); deterministic generation
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta9", "Gamma", "x", "Q7", "zz")
    val cases = (1 to 80).map { _ =>
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(4) match {
        case 0 => words(rnd.nextInt(words.size))
        case 1 => " "
        case 2 => "\n"
        case _ => "\t"
      }).mkString(" ")
    }
    val got = cases.toDF("h").select(Html.extractText(col("h")))
      .as[String].collect().toSeq
    val expected = cases.map(_.split("\\s+").filter(_.nonEmpty).mkString(" "))
    assert(got == expected)
  }
}
