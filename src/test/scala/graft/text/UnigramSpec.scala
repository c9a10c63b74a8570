package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.UnigramVocab

class UnigramSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("Viterbi kernel: max-score segmentation, exact-tie lex rule, null off-vocab") {
    // vocab: singles a,b (logp -2 each), pair "ab" (logp -1)
    val v = new UnigramVocab(
      Array("a", "b", "ab"), Array(-2.0, -2.0, -1.0))
    // "ab": piece "ab" (-1) beats a+b (-4)
    assert(v.segment("ab").toSeq == Seq("ab"))
    // "aba": ab+a (-3) beats a+b+a (-6); a+ba impossible (no "ba")
    assert(v.segment("aba").toSeq == Seq("ab", "a"))
    // EXACT tie: with logp(ab) = -4 = logp(a)+logp(b), the joined paths
    // "\u0001a\u0001b" < "\u0001ab" (separator sorts below 'b') — the
    // lex rule must pick the two-piece split, matching the oracle's
    // ORDER BY score DESC, path ASC
    val tied = new UnigramVocab(
      Array("a", "b", "ab"), Array(-2.0, -2.0, -4.0))
    assert(tied.segment("ab").toSeq == Seq("a", "b"))
    // off-vocabulary character → null (callers route to unk)
    assert(v.segment("abc") == null)
    assert(v.segment("").isEmpty)
  }

  test("train: empty/whitespace-only corpus refuses with a clear message, not an NPE") {
    val docs = Seq((1L, ""), (2L, " \t "), (3L, "   ")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](Unigram.train(docs, "text"))
    assert(e.getMessage.contains("no words to train on"))
  }

  test("train: seed/usage/smoothing pipeline is deterministic and coverage-complete") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The CAT sat"),
      (3L, "internationalization stays out of training"), // > 12 chars
      (4L, "")).toDF("doc_id", "text")
    val t1 = Unigram.train(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val t2 = Unigram.train(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(t1.toSeq == t2.toSeq, "training must be run-to-run deterministic")
    val pieces = t1.map(_._1).toSet
    // every single character of every in-scope (≤ 12 chars, lowered)
    // word is in the vocabulary — the coverage guarantee
    val chars = "the cat sat on the mat training stays out of"
      .replace(" ", "").toSet
    assert(chars.forall(c => pieces.contains(c.toString)), pieces)
    // the overlong word contributed nothing
    assert(!pieces.exists(_.contains("z")), "internationalization leaked in")
    // smoothing: every logp is finite and negative
    assert(t1.forall(x => x._3 < 0.0 && !x._3.isInfinite))
    // frequent whole words of length <= 4 become pieces with usage
    assert(t1.exists(x => x._1 == "the" && x._2 >= 2L))
  }

  test("encode: piece counts per doc, overlong words as is_unk rows") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "internationalization now"),
      (3L, "")).toDF("doc_id", "text")
    val vocab = Unigram.trainedVocab(docs, "text")
    val enc = Unigram.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getLong(3)))
    // doc 1: "the" appears twice → its piece rows carry n = 2 in total
    val theRows = enc.filter(e => e._1 == 1L && e._2 == "the" && !e._3)
    assert(theRows.map(_._4).sum == 2L)
    // the overlong word surfaces as ONE is_unk row, verbatim
    assert(enc.count(e => e._1 == 2L && e._3) == 1)
    assert(enc.exists(e =>
      e._1 == 2L && e._2 == "internationalization" && e._3 && e._4 == 1L))
    // the empty doc contributes nothing
    assert(!enc.exists(_._1 == 3L))
    // within a doc, total piece-instance mass reconstructs the words:
    // piece lengths over non-unk rows sum to the doc's character mass
    val doc1Chars = "thecatsatonthemat".length.toLong
    assert(enc.filter(e => e._1 == 1L && !e._3)
      .map(e => e._2.length * e._4).sum == doc1Chars)
  }
}
