package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate removal — the first stage of every web-crawl curation
  * pipeline (C4, CCNet, RefinedWeb all start from markup, not clean text):
  * drop script/style payloads and comments, strip tags, decode the common
  * entities, collapse whitespace.
  *
  * Two formulations, spec-pinned equal on realistic markup:
  * [[extractText]] is the [[graft.functions.HtmlKernels]] single-pass
  * byte-scan kernel (one output buffer, no regex — the 100 TB path);
  * [[extractTextReference]] is the regexp_replace/replace chain whose
  * staged semantics define the operator and whose RE2-compatible
  * patterns keep it restatable in the DuckDB oracle. Each chain stage is
  * a native codegen'd expression with a once-compiled foldable pattern,
  * but six stages materialize six copies of every document — the kernel
  * exists to collapse that to one.
  *
  * Scale shape: pure scalar pipeline — zero shuffles, zero driver work;
  * at 100 TB this is a map-only pass whose cost is the parquet scan.
  *
  * Deliberate limits (documented, spec-pinned): no nested-comment
  * handling (HTML has none), attribute values containing a literal `>`
  * end the tag early (real extractors share this fast-path behavior),
  * and only the ubiquitous named entities are decoded.
  */
object Html {

  /** Entity decode table. Order matters and is load-bearing:
    * `&lt;`/`&gt;` decode AFTER tag stripping (a literal `&lt;b&gt;` in
    * text must NOT come back as a strippable tag) and `&amp;` decodes
    * LAST (the standard order — `&amp;lt;` means the four characters
    * `&lt;`, not `<`). */
  private val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Script/style payloads and comments vanish entirely; every other tag
    * becomes a space (block boundaries must not glue words together). */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // a tag starts with a letter or '/' — a bare '<' followed by space or
    // digit is text (common in scraped pages: "a < b", "<3")
    regexp_replace(noComment, "(?s)</?[a-zA-Z][^>]*>", " ")
  }

  /** Decode the common named entities (post-strip; see [[entities]]). */
  def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }

  /** Full extraction: markup out, entities decoded, whitespace collapsed
    * to single spaces, trimmed — the single-pass kernel. */
  def extractText(c: Column): Column =
    graft.functions.GraftFunctions.extractHtmlText(c)

  /** The staged reference formulation (see object scaladoc); HtmlSpec
    * pins the kernel against it. */
  def extractTextReference(c: Column): Column =
    trim(regexp_replace(decodeEntities(stripMarkup(c)), "\\s+", " "))
}
