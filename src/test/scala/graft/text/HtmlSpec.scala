package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class HtmlSpec extends AnyFunSuite with SparkTestBase {

  // every literal case is asserted through BOTH formulations: the
  // single-pass kernel (the default) and the staged regex reference
  private def extract(html: String): String = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(Html.extractText(col("h")), Html.extractTextReference(col("h")))
      .head
    assert(r.getString(0) == r.getString(1),
      s"kernel/reference divergence on ${html.take(80)}: " +
        s"'${r.getString(0)}' vs '${r.getString(1)}'")
    r.getString(0)
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

  test("truncation edges: unterminated constructs stay literal, both formulations") {
    // unterminated generic tag: no '>' anywhere after it
    assert(extract("a <div class") == "a <div class")
    // unterminated tag whose tail holds an entity
    assert(extract("<div &amp; x") == "<div & x")
    // unclosed script/style: the OPENER strips (chain stage d), body stays
    assert(extract("<script>var x;") == "var x;")
    assert(extract("<style>p{}") == "p{}")
    // script opener with no '>': literal
    assert(extract("<script foo") == "<script foo")
    // unclosed comment: '<' literal, inner tags still strip
    assert(extract("<!-- a <p> b") == "<!-- a b")
    // tag spanning a stray '<': one match to the first '>'
    assert(extract("<div <p> q") == "q")
    // non-greedy closer: tag ends at the FIRST '>', rest is text
    assert(extract("<a href=\"x>y\">z") == "y\">z")
    // <scriptx> counts as a script opener (the [^>]* quirk), closer exact
    assert(extract("<scripty>hidden</script>kept") == "kept")
    // closer must be exactly </script> — a spaced closer doesn't close
    assert(extract("<script>a</script >b</script>c") == "c")
  }

  test("property: kernel == staged reference on realistic tag soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    val words = Vector("data", "Pipeline", "x9", "née", "日本", "a&b", "5<6", "7>z")
    val entities = Vector("&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;", "&amp;",
      "&amp;lt;", "&unknown;", "&nbsp")
    val tags = Vector("<p>", "</p>", "<BR/>", "<div class=\"x\">", "</DIV>",
      "<img src='y.png'/>", "<h1 data-a='1'>", "</ nottag>", "<3", "< b")
    val blocks = Vector(
      "<script>var a=1; if(a<2){}</script>",
      "<SCRIPT type=\"text/javascript\">leak()</script>",
      "<style>p > a { color: red }</style>",
      "<!-- hidden -->", "<!--\nmultiline\n-->")
    def piece(): String = rnd.nextInt(10) match {
      case 0 | 1 | 2 | 3 => words(rnd.nextInt(words.size))
      case 4 | 5 => entities(rnd.nextInt(entities.size))
      case 6 | 7 => tags(rnd.nextInt(tags.size))
      case 8 => blocks(rnd.nextInt(blocks.size))
      case _ => Vector(" ", "\n", "\t", "  ")(rnd.nextInt(4))
    }
    val cases = (1 to 150).map(_ =>
      Seq.fill(rnd.nextInt(14))(piece()).mkString(rnd.nextInt(3) match {
        case 0 => "" case 1 => " " case _ => "\n"
      }))
    val rows = cases.toDF("h")
      .select(Html.extractText(col("h")), Html.extractTextReference(col("h")))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1),
        s"divergence on: ${c.take(120)}\nkernel: ${r.getString(0)}\nref:    ${r.getString(1)}")
    }
  }

  test("main-content: chrome blocks drop by density, body survives verbatim") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog tonight"
    val page =
      "<html><head><title>My Site</title><style>p{}</style>" +
        "<script>if(1<2){track();}</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
        "<ul><li><a>First link</a></li><li><a>Second link</a></li></ul>" +
        s"<article><p>$body</p></article>" +
        "<footer>&copy; 2026 <a>Privacy policy</a> <a>Terms of use</a></footer>" +
        "</body></html>"
    val cases = Seq(
      page,
      // pure chrome → EMPTY, not null
      "<body><nav><a>Home</a> <a>About</a></nav><footer><a>T</a></footer></body>",
      // link density EXACTLY 1/3 must DROP (strict 3·lw < w), 2/7 keeps
      "<p>one two three four five <a>six seven eight</a> nine</p>",
      "<p>one two three four five <a>six seven</a></p>",
      // under the 5-word floor drops even with zero links
      "<p>four words not five</p>",
      // nested inline markup inside the anchor still counts as link words
      "<p>alpha beta gamma delta <a><b>x y z w</b></a> eps zeta eta theta iota kappa</p>")
    val got = cases.toDF("h")
      .select(Html.extractMainText(col("h"))).as[String].collect().toSeq
    assert(got == Seq(
      body,
      "",
      "", // 9 words, 3 link words: 3·3 < 9 is FALSE — dropped
      "one two three four five six seven", // 7 words, 2 link: kept
      "",
      "alpha beta gamma delta x y z w eps zeta eta theta iota kappa"))
    // block census on the realistic page: title, nav, 2 list items,
    // article, footer = 6 non-empty blocks, 1 kept
    val b = cases.take(1).toDF("h").select(
      size(Html.mainBlocks(col("h"))),
      size(filter(Html.mainBlocks(col("h")), x => Html.isContentBlock(x))))
      .head
    assert((b.getInt(0), b.getInt(1)) == (6, 1))
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
