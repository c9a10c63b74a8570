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

  test("blocklist: domain entries block their subtree, host entries only themselves; anti-join plan stays shuffle-free") {
    import spark.implicits._
    val urls = Seq(
      1L -> "https://sub.bad.org/a", // blocked: registered domain listed
      2L -> "https://bad.org/b", // blocked: is the listed domain
      3L -> "https://evil.good.com/c", // blocked: full host listed
      4L -> "https://other.good.com/d", // kept: sibling host, domain not listed
      5L -> "https://fine.net/e") // kept
    val block = Seq("bad.org", "evil.good.com")
    // literal shape
    val kept1 = urls.toDF("id", "url")
      .filter(!UrlOps.blockedBy(col("url"), block))
      .select("id").as[Long].collect().toSet
    assert(kept1 == Set(4L, 5L))
    // DataFrame / broadcast-anti-join shape agrees
    val keptDf = UrlOps.filterBlocked(
      urls.toDF("id", "url"), col("url"), block.toDF("domain"))
    assert(keptDf.select("id").as[Long].collect().toSet == Set(4L, 5L))
    // and plans with ZERO shuffle exchanges on the corpus side (two
    // broadcast left-anti joins)
    val exchanges = keptDf.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"blocklist filter must not shuffle the corpus")
  }
}
