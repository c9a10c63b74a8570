package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class LineDedupSpec extends AnyFunSuite with SparkTestBase {

  private def run(pages: Seq[(Long, String)], sep: String = "\n"): Map[Long, (String, Long)] = {
    import spark.implicits._
    Dedup.dedupLinesWithin(pages.toDF("doc_id", "page"), "doc_id", "page", sep)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  test("repeated lines keep their FIRST occurrence, original order") {
    val got = run(Seq(
      1L -> "nav\ntitle\nbody one\nnav\nbody two\ntitle\nfooter",
      2L -> "only"))
    assert(got(1L) == ("nav\ntitle\nbody one\nbody two\nfooter", 5L))
    assert(got(2L) == ("only", 1L))
  }

  test("dedup is strictly per-document: cross-page repeats survive") {
    val got = run(Seq(1L -> "chrome\na", 2L -> "chrome\nb"))
    assert(got(1L) == ("chrome\na", 2L))
    assert(got(2L) == ("chrome\nb", 2L))
  }

  test("CROSS-doc scrub: boilerplate drops everywhere, unique lines survive, in-doc repeats don't inflate df") {
    import spark.implicits._
    def runAcross(pages: Seq[(Long, String)], maxDf: Long): Map[Long, (String, Long, Long)] =
      Dedup.dedupLinesAcross(pages.toDF("doc_id", "page"), "doc_id", "page",
        maxDocFreq = maxDf)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val got = runAcross(Seq(
      1L -> "nav\nunique one\nrefrain\nrefrain\nfooter",
      2L -> "nav\nunique two\nfooter",
      3L -> "nav\nunique three\nfooter"), maxDf = 2L)
    // nav/footer: df = 3 > 2 → scrubbed everywhere; "refrain" repeats
    // IN doc 1 only → df = 1 → BOTH occurrences survive
    assert(got(1L) == ("unique one\nrefrain\nrefrain", 3L, 2L))
    assert(got(2L) == ("unique two", 1L, 2L))
    assert(got(3L) == ("unique three", 1L, 2L))
    // a fully-boilerplate doc comes back EMPTY, not missing
    val got2 = runAcross(Seq(
      1L -> "nav", 2L -> "nav", 3L -> "nav\nkeep me"), maxDf = 1L)
    assert(got2(1L) == ("", 0L, 1L))
    assert(got2(3L) == ("keep me", 1L, 1L))
    assert(got2.keySet == Set(1L, 2L, 3L))
    // EMPTY lines are paragraph separators, NOT boilerplate: present in
    // every doc, they must never be scrubbed (the empty-gram rule)
    val got3 = runAcross(Seq(
      1L -> "para one\n\npara two",
      2L -> "alpha\n\nbeta",
      3L -> "gamma\n\ndelta"), maxDf = 1L)
    assert(got3(1L) == ("para one\n\npara two", 3L, 0L),
      "blank paragraph separators must survive corpus-wide repetition")
    assert(got3(2L) == ("alpha\n\nbeta", 3L, 0L))
  }

  test("edge: empty page, all-duplicate page, custom separator") {
    val got = run(Seq(1L -> "", 2L -> "x\nx\nx"))
    assert(got(1L) == ("", 1L))
    assert(got(2L) == ("x", 1L))
    val sep = run(Seq(3L -> "a|b|a|c"), sep = "|")
    assert(sep(3L) == ("a|b|c", 3L))
  }

  test("property: lines distinct, first-occurrence order, idempotent") {
    import org.scalacheck.{Gen, Prop}
    val lineGen = Gen.oneOf("a", "b", "c", "dd", "", "e f")
    val pageGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    // local model mirrors the operator; the Spark side is pinned vs the
    // model on a batched fixture below
    def model(page: String): (String, Long) = {
      val kept = page.split("\n", -1).distinct
      (kept.mkString("\n"), kept.length.toLong)
    }
    graft.PropCheck.check(Prop.forAll(pageGen) { (p: String) =>
      val (d1, n1) = model(p)
      val (d2, n2) = model(d1) // idempotent
      d1 == d2 && n1 == n2 && n1 == p.split("\n", -1).distinct.length
    })
    // one batched Spark run vs the model
    val rnd = new scala.util.Random(7)
    val lines = Vector("a", "b", "c", "dd", "", "e f")
    val pages = (1 to 60).map(i =>
      i.toLong -> Seq.fill(rnd.nextInt(10) + 1)(lines(rnd.nextInt(lines.size)))
        .mkString("\n"))
    val got = run(pages)
    pages.foreach { case (id, p) => assert(got(id) == model(p)) }
  }
}
