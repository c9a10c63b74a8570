package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextOpsSpec extends AnyFunSuite with SparkTestBase {
  import TextOps._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")
  }

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).collect().head.getSeq[String](0).toSeq
  }

  test("tokens and tokenCount") {
    assert(one[Int](tokenCount(col("t")), "a b  c") == 3)
    assert(one[Int](tokenCount(col("t")), "   ") == 0)
    assert(one[Int](tokenCount(col("t")), "") == 0)
    assert(one[Int](tokenCount(col("t")), "single") == 1)
  }

  test("charShingles: sliding distinct n-grams; short text degrades to whole") {
    assert(oneSeq(charShingles(col("t"), 3), "abcd") == Seq("abc", "bcd"))
    assert(oneSeq(charShingles(col("t"), 3), "aaaa") == Seq("aaa"))
    assert(oneSeq(charShingles(col("t"), 5), "abc") == Seq("abc"))
  }

  test("wordShingles") {
    assert(oneSeq(wordShingles(col("t"), 2), "a b c") == Seq("a b", "b c"))
    assert(oneSeq(wordShingles(col("t"), 3), "a b") == Seq("a b"))
  }

  test("ratios and quality score are deterministic and bounded") {
    val q = one[Double](qualityScore(col("t")),
      "the quick brown fox jumps over the lazy dog. it was a good day.")
    assert(q >= 0.0 && q <= 1.2)
    assert(one[Double](punctRatio(col("t")), "....") == 1.0)
    assert(one[Double](stopwordRatio(col("t")), "the cat") == 0.5)
    assert(one[Double](meanTokenLen(col("t")), "ab cdef") == 3.0)
  }

  test("langId picks marker-heavy language; deterministic fallback") {
    assert(one[String](langId(col("t")), "the cat and the dog of the house") == "en")
    assert(one[String](langId(col("t")), "der hund und die katze ist gut") == "de")
    assert(one[String](langId(col("t")), "xyzzy plugh") == "und")
    assert(one[String](langId(col("t")), "这是在的了") == "zh")
  }

  test("pii scrub: emails before phones, multiples, clean text untouched") {
    assert(one[String](scrubPii(col("t")),
      "mail a.b+c@ex-1.org or x@y.io call +1 (555) 123-4567 now") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> now")
    assert(one[String](scrubPii(col("t")), "no pii here 42") == "no pii here 42")
    // email scrub runs first so the mailbox digits don't trip the phone rule
    assert(one[String](scrubPii(col("t")), "x 12345678901@host.com y") ==
      "x <EMAIL> y")
  }

  test("text metrics run over the documents table without shuffle") {
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val out = docs.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"))
    assert(out.count() == docs.count())
    // scalar ops must not introduce a shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("repetition ratios: duplicates counted, short/empty texts are 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),    // 5 toks, 2 distinct → 0.6; 4 bigrams, 2 distinct → 0.5
      (2L, "all words differ here"),
      (3L, ""),
      (4L, "one")
    ).toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      TextOps.repeatedTokenRatio(col("text")).as("rt"),
      TextOps.repeatedNgramRatio(col("text"), 2).as("r2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((0.6, 0.5)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0))) // < n tokens → no n-grams → 0
  }

  test("contamination flags: shared 3-grams counted per train doc, eval side broadcast") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown"+"quick brown fox"
      (2L, "completely novel training content"),
      (3L, "quick brown fox runs far")     // shares "quick brown fox"
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox sat")).toDF("doc_id", "text")
    val flags = TextOps.contaminationFlags(train, eval, "doc_id", "text")
    val got = flags.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L)) // doc 2 clean → absent
    // scale shape: the eval gram set broadcasts
    val plan = flags.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
  }

  test("winnowing: matches the local model; shared substrings guarantee overlap") {
    import spark.implicits._
    val k = 8; val w = 4
    def localPoly(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    def localWinnow(s: String): Set[Long] = {
      val hashes =
        if (s.length < k) Seq(localPoly(s))
        else (0 to s.length - k).map(i => localPoly(s.substring(i, i + k)))
      val mins =
        if (hashes.length <= w) Seq(hashes.min)
        else hashes.sliding(w).map(_.min).toSeq
      mins.toSet
    }

    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a totally different sentence with other words"),
      // doc 3 embeds a ≥ k+w−1 = 11-char run of doc 1
      (3L, "XYZ quick brown fox QRS"),
      (4L, "short"),  // < k → whole-text hash
      (5L, ""))
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.winnowFingerprints(col("text"), k, w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

    texts.foreach { case (id, t) =>
      assert(got(id) == localWinnow(t), s"doc $id mismatch") }
    // the winnowing guarantee: shared substring of length ≥ k+w−1 ⇒
    // at least one shared selected fingerprint
    assert(got(1L).intersect(got(3L)).nonEmpty)
    // unrelated docs share nothing here
    assert(got(1L).intersect(got(2L)).isEmpty)
    assert(got(4L) == Set(localPoly("short")))
  }

  test("temperature mix rates: smallest source keeps all, rates flatten with alpha") {
    val counts = Map("big" -> 9000L, "mid" -> 1000L, "small" -> 90L)
    val half = TextOps.temperatureMixPermille(counts, alpha = 0.5)
    // normalized: min-count source keeps 1000 permille
    assert(half("small") == 1000)
    // rate = floor(1000 * sqrt(n_min/n)): monotone down in n
    assert(half("mid") == math.floor(1000.0 * math.sqrt(90.0 / 1000.0)).toInt)
    assert(half("big") == math.floor(1000.0 * math.sqrt(90.0 / 9000.0)).toInt)
    assert(half("small") > half("mid") && half("mid") > half("big"))
    // alpha = 1 keeps NATURAL proportions: every rate is 1000 (no flattening)
    assert(TextOps.temperatureMixPermille(counts, 1.0).values.forall(_ == 1000))
    // flatter alpha suppresses the big source harder
    val quarter = TextOps.temperatureMixPermille(counts, alpha = 0.25)
    assert(quarter("big") < half("big"))
    // the floor never silences a source
    val extreme = TextOps.temperatureMixPermille(
      Map("a" -> 1L, "b" -> 100000000L), alpha = 0.5)
    assert(extreme("b") == 1)
  }

  test("temperature mix filter: deterministic, partitioning-independent, flattening") {
    // the testdata's sources are perfectly balanced (flattening is a
    // no-op there), so skew deterministically: 60/30/10 by doc_id
    val docsDf = graft.sources.Tables
      .read(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("grp",
        when(pmod(col("doc_id"), lit(10)) < 6, "heavy")
          .when(pmod(col("doc_id"), lit(10)) < 9, "mid")
          .otherwise("rare"))
    val kept = docsDf
      .filter(TextOps.temperatureMixFilter(docsDf, "grp", "text", alpha = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size < docsDf.count())
    val kept2 = docsDf.repartition(13)
      .filter(TextOps.temperatureMixFilter(docsDf, "grp", "text", alpha = 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    // post-sample shares are FLATTER than natural: the heavy group's
    // sample share drops toward the flattened target, the rare group
    // keeps everything (its rate is the normalized 1000 permille)
    val natural = TextOps.sourceCounts(docsDf, "grp")
    val sampled = TextOps.sourceCounts(
      docsDf.filter(TextOps.temperatureMixFilter(docsDf, "grp", "text", 0.5)),
      "grp")
    assert(sampled("rare") == natural("rare"))
    val natShare = natural("heavy").toDouble / natural.values.sum
    val samShare = sampled("heavy").toDouble / sampled.values.sum
    assert(samShare < natShare,
      s"heavy share $samShare should flatten below natural $natShare")

    // NULL sources refuse loudly: a null group would both drive n_min
    // AND dodge its own rate branch (null-unsafe equality) — silently
    // anti-flattening — so the op must throw instead
    val withNulls = docsDf.withColumn("grp",
      when(col("doc_id") % 7 === 0, lit(null.asInstanceOf[String]))
        .otherwise(col("grp")))
    val e = intercept[IllegalArgumentException] {
      TextOps.temperatureMixFilter(withNulls, "grp", "text", 0.5)
    }
    assert(e.getMessage.contains("NULL source values"))
  }
}
