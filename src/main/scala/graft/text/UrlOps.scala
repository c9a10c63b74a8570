package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and domain extraction for web-crawl curation — the
  * canonical pre-step before URL-keyed dedup (two crawls of the same page
  * differ only in tracking params / host case / trailing slash, so exact
  * dedup on the RAW url misses them). Everything here is pure column
  * expressions (regexp + string ops, codegen'd): zero shuffles, scales as
  * a scan, usable inside any curation chain.
  *
  * Normalization rules (the common-denominator canon of public crawl
  * pipelines): lowercase scheme and host, strip a leading `www.`, drop
  * default ports (`:80` http / `:443` https), drop trailing slashes from
  * the path, drop the fragment, and remove tracking query parameters
  * (`utm_*`, `gclid`, `fbclid`) while preserving the order of the rest.
  * Unparseable urls normalize to null — filterable, never silently
  * passed through.
  */
object UrlOps {

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
  private val TrackingRe = "^(utm_[^=&]*|gclid|fbclid)(=.*)?$"

  def scheme(url: Column): Column = lower(regexp_extract(url, UrlRe, 1))

  /** Lowercased host, `www.` and any `:port` stripped. */
  def host(url: Column): Column = {
    val hp = lower(regexp_extract(url, UrlRe, 2))
    val noPort = when(hp.contains(":"), substring_index(hp, ":", 1)).otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Explicit port as a string, "" when absent. */
  def port(url: Column): Column = {
    val hp = regexp_extract(url, UrlRe, 2)
    when(hp.contains(":"), substring_index(hp, ":", -1)).otherwise(lit(""))
  }

  /** Path with trailing slashes dropped ("" for the root). */
  def path(url: Column): Column =
    regexp_replace(regexp_extract(url, UrlRe, 3), "/+$", "")

  /** Query string with tracking params removed, remaining order kept. */
  def cleanQuery(url: Column): Column = {
    val raw = regexp_extract(url, UrlRe, 4)
    array_join(
      filter(split(raw, "&"), p => !p.rlike(TrackingRe) && p =!= ""), "&")
  }

  /** Registered domain, public-suffix-list-free heuristic: the last two
    * dot-labels of the host (`a.b.example.com` → `example.com`). Wrong
    * for multi-label public suffixes (`*.co.uk`) — a PSL table join is
    * the production upgrade; the heuristic keeps this a pure expression. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    when(size(labels) >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
      .otherwise(hostCol)
  }

  /** The normalized url rebuilt from the parts above; null when the url
    * does not parse (no scheme://host). */
  def normalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val p = port(url)
    val portPart = when(p === "" ||
        (sch === "https" && p === "443") || (sch === "http" && p === "80"),
      lit("")).otherwise(concat(lit(":"), p))
    val q = cleanQuery(url)
    val queryPart = when(q === "", lit("")).otherwise(concat(lit("?"), q))
    when(sch === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, path(url), queryPart))
  }

  // --- domain blocklist filtering (the Dolma/RefinedWeb URL-filter
  // stage: a curated list of domains whose pages never enter the
  // corpus). An entry blocks its whole subtree: a row drops when its
  // full (www-stripped, lowercased) host OR its registered domain is
  // listed — listing `example.org` blocks `sub.example.org`, listing
  // `bad.example.com` blocks only that host.

  /** True when `url`'s host or registered domain is in `domains` — the
    * literal-list shape for the usual few-hundred-entry safety lists
    * (compiled into the scan as a codegen'd in-set; zero shuffles). */
  def blockedBy(url: Column, domains: Seq[String]): Column = {
    val h = host(url)
    h.isInCollection(domains) || registeredDomain(h).isInCollection(domains)
  }

  /** Blocklist as a DataFrame (one `domain` column) for web-scale
    * lists: two broadcast LEFT ANTI joins (host key, then
    * registered-domain key). Even a million-domain list is a few MB —
    * always broadcastable — so the corpus side stays SHUFFLE-FREE
    * (UrlOpsSpec pins the zero-exchange plan). */
  def filterBlocked(df: org.apache.spark.sql.DataFrame, urlCol: Column,
      blocklist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val keyed = df
      .withColumn("__block_h", host(urlCol))
      .withColumn("__block_rd", registeredDomain(col("__block_h")))
    keyed
      .join(broadcast(blocklist.select(col("domain").as("__block_h"))),
        Seq("__block_h"), "left_anti")
      .join(broadcast(blocklist.select(col("domain").as("__block_rd"))),
        Seq("__block_rd"), "left_anti")
      .drop("__block_h", "__block_rd")
  }
}
