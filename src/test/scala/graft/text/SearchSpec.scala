package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SearchSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))

  test("bm25: a planted term-dense doc ranks first; k bounds the result") {
    import spark.implicits._
    val planted = Seq((990001L, "spark window merge spark window merge spark"))
      .toDF("doc_id", "text")
    val corpus = docsDf.unionByName(planted)
    val top = Search.bm25TopK(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10).collect()
    assert(top.length == 10)
    assert(top.head.getLong(0) == 990001L, s"planted doc not first: ${top.head}")
    // scores are non-increasing and ties break by ascending id
    val scores = top.map(r => (r.getDouble(1), r.getLong(0)))
    scores.sliding(2).foreach {
      case Array((s1, id1), (s2, id2)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2), s"order violated: $s1/$id1 vs $s2/$id2")
      case _ =>
    }
  }

  test("bm25 is reproducible across partitionings") {
    val a = Search.bm25TopK(docsDf, "doc_id", "text",
      Seq("spark", "merge"), k = 15).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Search.bm25TopK(docsDf.repartition(17), "doc_id", "text",
      Seq("spark", "merge"), k = 15).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("bm25 matches a local reference computation exactly at 6 dp") {
    val terms = Seq("spark", "window", "merge")
    val got = Search.bm25TopK(docsDf, "doc_id", "text", terms, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val rows = docsDf.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
    val n = rows.length.toDouble
    val avgdl = rows.map(_._2.length).sum / n
    val df = terms.map(t => t -> rows.count(_._2.contains(t)).toDouble).toMap
    val expected = rows.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * 2.2 /
          (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      }.sum
      if (score > 0) // Spark round() is HALF_UP, not rint's half-even
        Some(id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }.toMap
    assert(got == expected,
      s"diff: ${(got.toSet diff expected.toSet).take(3)} | ${(expected.toSet diff got.toSet).take(3)}")
  }
}
