package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.{PropCheck, SparkTestBase}
import graft.functions.{GraftHash, TextKernels}

/** Pins the Lee-et-al-style repeated-substring removal ([[SubstrDedup]])
  * and its window-fingerprint kernel
  * ([[graft.functions.GraftHash.tokenWindowFps]]). */
class SubstrDedupSpec extends AnyFunSuite with SparkTestBase {

  private val W = 4 // small window so a hand corpus exercises every path

  // ----------------------------------------------------------------
  // kernel
  // ----------------------------------------------------------------

  /** Reference form: per window, join tokens with ' ' and pair the two
    * whole-string fold hashes — what the DuckDB oracle restates. */
  private def refWindowFps(text: String, w: Int): Seq[Long] = {
    val arr = TextKernels.tokenizeWs(UTF8String.fromString(text))
    val toks = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    if (toks.length < w) Seq.empty
    else toks.sliding(w).map { win =>
      val s = UTF8String.fromString(win.mkString(" "))
      GraftHash.fingerprint64(s) | (GraftHash.fingerprint37(s) << 30)
    }.toSeq
  }

  private def kernelFps(text: String, w: Int): Seq[Long] = {
    val out = GraftHash.tokenWindowFps(UTF8String.fromString(text), w)
    (0 until out.numElements()).map(out.getLong)
  }

  test("tokenWindowFps: prefix-hash kernel equals the per-window join+fold reference") {
    val texts = Seq(
      "a b c d e f", "one two three four", "x", "", "   ", "a  b\tc\nd e",
      "fé 世界 ascii mix padded tokens here", "a a a a a a a a")
    for (t <- texts; w <- Seq(1, 2, 4, 8))
      assert(kernelFps(t, w) == refWindowFps(t, w), s"text '$t' w=$w")
  }

  test("tokenWindowFps: property — random unicode/whitespace text, any w") {
    val tokenGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("fé"),
      Gen.const("世界"), Gen.const("a'b\\c"))).map(_.mkString(" "))
    val junkWs = Gen.oneOf("", " ", "  ", "\t", "\n")
    PropCheck.check(Prop.forAll(tokenGen, junkWs, junkWs, Gen.choose(1, 6)) {
      (core: String, pre: String, post: String, w: Int) =>
        val text = pre + core + post
        kernelFps(text, w) == refWindowFps(text, w)
    })
  }

  test("tokenWindowFps: short text yields NO windows (removal must never see a pseudo-window)") {
    assert(kernelFps("one two three", 4).isEmpty)
    assert(kernelFps("", 1).isEmpty)
    assert(kernelFps("   ", 2).isEmpty)
  }

  // ----------------------------------------------------------------
  // operator, hand corpus
  // ----------------------------------------------------------------

  // shared licence-ish passage (8 tokens ⇒ 5 duplicated 4-windows in a
  // row, one merged span), planted mid-doc in 2 and 3, owned by 1
  private val passage = "all rights reserved see licence for terms here"

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"unrelated opening words $passage and a tail"),
      (3L, s"$passage"),
      // doc-internal repeat only — never duplicated across docs
      (4L, "echo echo echo echo echo echo echo echo"),
      (5L, "too short for windows"),
      (6L, "completely distinct content with no shared spans at all")
    ).toDF("doc_id", "text").cache()
  }

  test("removalStarts: only non-owner occurrences of cross-doc windows") {
    val starts = SubstrDedup.removalStarts(corpus, "doc_id", "text", W)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // doc 1 owns every passage window: nothing removed from it
    assert(!starts.exists(_._1 == 1L))
    // doc 2: passage occupies tokens 4..11 ⇒ starts 4..8
    assert(starts.filter(_._1 == 2L) == Set((2L, 4), (2L, 5), (2L, 6), (2L, 7), (2L, 8)))
    // doc 3: passage is the whole doc ⇒ starts 1..5
    assert(starts.filter(_._1 == 3L) == (1 to 5).map((3L, _)).toSet)
    // internal-repeat doc and distinct docs: untouched
    assert(!starts.exists(s => s._1 == 4L || s._1 == 5L || s._1 == 6L))
  }

  test("removedSpans: overlapping windows merge to one maximal span") {
    val spans = SubstrDedup.removedSpans(corpus, "doc_id", "text", W)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((2L, 4, 11), (3L, 1, 8)))
  }

  test("dedupSubstrings: owner keeps, non-owners lose the span, whitespace normalizes") {
    val out = SubstrDedup.dedupSubstrings(corpus, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((12L, 0L, s"alpha beta $passage gamma delta")))
    assert(out(2L) == ((14L, 8L, "unrelated opening words and a tail")))
    assert(out(3L) == ((8L, 8L, ""))) // fully-duplicated doc empties
    assert(out(4L)._2 == 0L) // internal repetition is not cross-doc
    assert(out(5L) == ((4L, 0L, "too short for windows")))
    assert(out(6L)._2 == 0L)
    assert(out.size == corpus.count())
  }

  test("incremental: catalog owns by value — even against lower batch ids") {
    import spark.implicits._
    val catalog = Seq(
      (100L, s"stored crawl doc with $passage inside it")).toDF("doc_id", "text")
    val batch = Seq(
      // LOWER id than the catalog doc: the catalog still owns
      (7L, s"new crawl doc repeating $passage verbatim"),
      // batch-internal duplication: 8 keeps (lowest batch id), 9 loses
      (8L, "shared batch only run w1 w2 w3 w4 w5 tail8"),
      (9L, "prefix9 shared batch only run w1 w2 w3 w4 w5"),
      (10L, "nothing here repeats anything at all ever seen")
    ).toDF("doc_id", "text")
    val catFps = SubstrDedup.windowFpSet(catalog, "text", W)
    val out = SubstrDedup.dedupSubstringsIncremental(
        batch, catFps, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(7L) == ((8L, "new crawl doc repeating verbatim")))
    assert(out(8L)._1 == 0L)
    assert(out(9L) == ((9L, "prefix9"))) // the 9 shared tokens all went
    assert(out(10L)._1 == 0L)
  }

  test("incremental == one-shot batch on the union when catalog ids precede batch ids") {
    import spark.implicits._
    val catalog = corpus.filter($"doc_id" <= 3)
    val batch = corpus.filter($"doc_id" > 3)
      .unionByName(Seq(
        (7L, s"late crawl copies $passage again"),
        (8L, s"and so does this one $passage thanks")).toDF("doc_id", "text"))
    val catFps = SubstrDedup.windowFpSet(catalog, "text", W)
    val inc = SubstrDedup.dedupSubstringsIncremental(
        batch, catFps, "doc_id", "text", W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val oneShot = SubstrDedup.dedupSubstrings(
        catalog.unionByName(batch), "doc_id", "text", W)
      .filter($"doc_id" > 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(inc == oneShot)
    assert(inc.exists(r => r._1 == 7L && r._3 == 8L)) // the passage went
  }

  test("adjacent-but-disjoint duplicated runs merge; separated runs do not") {
    import spark.implicits._
    // two shared 4-token runs in doc 12, separated by one private token
    // (gap 5 > W ⇒ two spans); in doc 13 back-to-back (gap 4 ≤ W ⇒ one)
    val df = Seq(
      (10L, "p q r s junk1 junk2 t u v w"),
      (11L, "x p q r s y t u v w z"),
      (12L, "a1 p q r s mid t u v w b1"),
      (13L, "c1 p q r s t u v w d1")
    ).toDF("doc_id", "text")
    val spans = SubstrDedup.removedSpans(df, "doc_id", "text", W)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 11/12/13 all lose both runs (owner 10); doc 12 keeps 'mid'
    assert(spans.filter(_._1 == 12L) == Set((12L, 2, 5), (12L, 7, 10)))
    assert(spans.filter(_._1 == 13L) == Set((13L, 2, 9)))
    val out = SubstrDedup.dedupSubstrings(df, "doc_id", "text", W)
      .filter($"doc_id" === 12L).collect().head
    assert(out.getString(3) == "a1 mid b1")
  }
}
