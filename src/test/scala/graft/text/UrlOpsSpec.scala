package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UrlOpsSpec extends AnyFunSuite with SparkTestBase {

  private def norm(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u")))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("normalization: case, www, default port, tracking params, fragment, trailing slash") {
    assert(norm(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&ref=r&gclid=g#frag",
      "http://example.org:80/",
      "http://example.org:8080/path",
      "https://sub.Example.com/p?fbclid=f&utm_campaign=c",
      "https://example.com/a//"
    ) == Seq(
      Some("https://example.com/A/b?ref=r"),
      Some("http://example.org"),
      Some("http://example.org:8080/path"),
      Some("https://sub.example.com/p"),
      Some("https://example.com/a")))
  }

  test("unparseable urls normalize to null, never pass through") {
    assert(norm("not a url", "example.com/no-scheme", "://missing", "")
      == Seq(None, None, None, None))
  }

  test("path case and non-tracking query order are preserved") {
    assert(norm("https://a.com/CaseSensitive/Path?b=2&a=1")
      == Seq(Some("https://a.com/CaseSensitive/Path?b=2&a=1")))
  }

  test("registered domain heuristic: last two labels") {
    import spark.implicits._
    val got = Seq("a.b.example.com", "example.org", "localhost")
      .toDF("h").select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "example.org", "localhost"))
  }
}
