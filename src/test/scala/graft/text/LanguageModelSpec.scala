package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LanguageModelSpec extends AnyFunSuite with SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq((1L, "a a b"), (2L, "b c a")).toDF("doc_id", "text")
  }

  test("vocabulary ranks by (count desc, word asc) with dense ids from 1") {
    val v = LanguageModel.vocabulary(corpus, "text", maxVocab = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("encodeDocs preserves document order, marks OOV as id 0") {
    val enc = LanguageModel.encodeDocs(corpus, "doc_id", "text", maxVocab = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(enc(1L) == ((3L, 0L, "1,1,2")))
    assert(enc(2L) == ((3L, 1L, "2,0,1"))) // c fell out of the top-2 vocab
  }

  test("vocabulary tie-break on equal counts is the lexicographic word") {
    import spark.implicits._
    val df = Seq((1L, "z y z y")).toDF("doc_id", "text")
    val v = LanguageModel.vocabulary(df, "text", maxVocab = 1).collect()
    assert(v.head.getString(0) == "y") // count tie (2,2) → 'y' < 'z' wins id 1
  }

  test("bigramSurprisal interpolates hand-computed MLE probabilities; short docs drop") {
    import spark.implicits._
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq((1L, "a a b"), (2L, "b c a"), (3L, "solo")).toDF("doc_id", "text")
    // unigrams: a=3 b=2 c=1 solo=1, tot=7
    // bigrams: (a,a)=1 (a,b)=1 (b,c)=1 (c,a)=1; prev counts from unigrams
    def term(bc: Double, pc: Double, uc: Double): Double =
      -math.log(0.75 * (bc / pc) + 0.25 * (uc / 7.0))
    val exp1 = r6((term(1, 3, 3) + term(1, 3, 2)) / 2) // (a,a)+(a,b)
    val exp2 = r6((term(1, 2, 1) + term(1, 1, 3)) / 2) // (b,c)+(c,a)
    val got = LanguageModel.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L)) // "solo" has no transition → no row
    assert(got(1L) == ((2L, exp1)))
    assert(got(2L) == ((2L, exp2)))
  }

  test("unigramSurprisal matches the hand-computed corpus distribution") {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // corpus counts: a=3 b=2 c=1, tot=6
    val exp1 = r6((-math.log(3.0 / 6) * 2 + -math.log(2.0 / 6)) / 3)
    val exp2 = r6((-math.log(2.0 / 6) + -math.log(1.0 / 6) + -math.log(3.0 / 6)) / 3)
    val got = LanguageModel.unigramSurprisal(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, exp1)))
    assert(got(2L) == ((3L, exp2)))
  }
}
