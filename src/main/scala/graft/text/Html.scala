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

  /** The invisible payloads only: script/style contents and comments
    * vanish entirely (their text was never page content). Shared by
    * [[stripMarkup]] and the block splitter ([[mainBlocks]]), which
    * must drop them BEFORE block segmentation — script text is not a
    * block. */
  def dropInvisible(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Script/style payloads and comments vanish entirely; every other tag
    * becomes a space (block boundaries must not glue words together). */
  def stripMarkup(c: Column): Column =
    // a tag starts with a letter or '/' — a bare '<' followed by space or
    // digit is text (common in scraped pages: "a < b", "<3")
    regexp_replace(dropInvisible(c), "(?s)</?[a-zA-Z][^>]*>", " ")

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

  // --- MAIN-CONTENT extraction (boilerplate blocks OUT, not just tags) —
  // the Kohlschütter 2010 insight reduced to its deterministic core:
  // page text splits into BLOCKS at block-level tag boundaries, and
  // navigation/footer/sidebar chrome is separable from body text by two
  // per-block densities alone — word count (boilerplate blocks are
  // short) and link density (boilerplate words live inside anchors).
  // The within/cross-doc line scrubs catch repeated chrome only when it
  // repeats; this classifier drops it from a SINGLE page. Pure scalar
  // pipeline (split + array lambdas over one row), zero shuffles.

  /** Block-level tag boundary: the HTML5 flow/sectioning set. Inline
    * markup (`<a>`, `<b>`, `<span>`, …) stays INSIDE its block — the
    * link-density signal needs the anchors in place. */
  private val BlockTagPattern =
    "(?is)</?(?:html|head|body|title|p|div|h[1-6]|li|ul|ol|dl|dt|dd|" +
      "table|thead|tbody|tfoot|tr|td|th|nav|header|footer|aside|" +
      "section|article|main|blockquote|pre|br|hr|form)\\b[^>]*>"

  /** Default minimum words for a content block (short fragments —
    * titles, buttons, copyright lines — are chrome even without links). */
  val DefaultMinWords = 5

  /** Non-empty text blocks of a page:
    * `array<struct<text, words int, link_words int>>` — `text` fully
    * extracted (tags stripped, entities decoded, whitespace collapsed),
    * `link_words` the word count inside `<a>` anchors (nested inline
    * markup normalized the same way). */
  def mainBlocks(c: Column): Column = {
    def wordsOf(t: Column): Column =
      when(t === "", 0).otherwise(size(split(t, " ")))
    val blocks = split(dropInvisible(c), BlockTagPattern)
    filter(
      transform(blocks, b => {
        val t = extractText(b)
        val linkWords = aggregate(
          regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
          lit(0), (acc, l) => acc + wordsOf(extractText(l)))
        struct(t.as("text"), wordsOf(t).as("words"),
          linkWords.as("link_words"))
      }),
      b => b.getField("words") > 0)
  }

  /** The content rule, integer-exact (the cross-multiplied-threshold
    * discipline — no float compare): a block is CONTENT iff it has at
    * least `minWords` words AND its link density is under 1/3
    * (`3·link_words < words`). */
  def isContentBlock(b: Column, minWords: Int = DefaultMinWords): Column =
    b.getField("words") >= minWords &&
      b.getField("link_words") * 3 < b.getField("words")

  /** Main text of a page: content blocks' text, document order,
    * single-space joined. A page of pure chrome comes back EMPTY — the
    * caller's length filter decides its fate (the dedupLinesAcross
    * contract). */
  def extractMainText(c: Column, minWords: Int = DefaultMinWords): Column =
    array_join(
      transform(
        filter(mainBlocks(c), b => isContentBlock(b, minWords)),
        b => b.getField("text")),
      " ")
}
