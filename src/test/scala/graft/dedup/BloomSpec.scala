package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BloomSpec extends AnyFunSuite with SparkTestBase {

  test("kernel: inserted hashes always probe true (no false negatives)") {
    val numBits = graft.functions.BloomKernels.optimalBits(1000, 0.01)
    val k = graft.functions.BloomKernels.optimalK(numBits, 1000)
    val bits = new Array[Long](numBits / 64)
    val rnd = new scala.util.Random(7)
    val inserted = Seq.fill(1000)(rnd.nextLong())
    inserted.foreach(h => graft.functions.BloomKernels.insert(bits, numBits, k, h))
    assert(inserted.forall(h =>
      graft.functions.BloomKernels.mightContain(bits, numBits, k, h)))
  }

  test("kernel: false-positive rate near the target") {
    val n = 5000
    val numBits = graft.functions.BloomKernels.optimalBits(n, 0.01)
    val k = graft.functions.BloomKernels.optimalK(numBits, n)
    val bits = new Array[Long](numBits / 64)
    val rnd = new scala.util.Random(11)
    (0 until n).foreach(_ =>
      graft.functions.BloomKernels.insert(bits, numBits, k, rnd.nextLong()))
    val probes = 20000
    val fps = (0 until probes).count(_ =>
      graft.functions.BloomKernels.mightContain(bits, numBits, k, rnd.nextLong()))
    val rate = fps.toDouble / probes
    assert(rate < 0.03, s"observed FPR $rate vs target 0.01")
  }

  test("bloom-prefiltered incremental dedup == plain anti-join dedup") {
    import spark.implicits._
    val corpus = (0L until 300L).map(i => (i, s"corpus doc number ${i % 120}"))
      .toDF("doc_id", "text")
    val catalog = Dedup.dedupCatalog(corpus, "text", xxhash64(_)).cache()
    // new crawl: half dups of the corpus, half genuinely new, in-batch dups
    val crawl = ((1000L until 1100L).map(i => (i, s"corpus doc number ${i % 120}")) ++
      (2000L until 2100L).map(i => (i, s"fresh doc ${i % 60}")))
      .toDF("doc_id", "text")

    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    val plain = resultSet(Dedup.dedupIncremental(
      crawl, catalog, "doc_id", "text", xxhash64(_)))
    val bloomed = resultSet(Bloom.dedupIncrementalBloom(
      crawl, catalog, "doc_id", "text", xxhash64(_)))
    assert(bloomed == plain)
    assert(plain.nonEmpty && plain.forall(_ >= 2000L)) // only fresh docs survive
  }

  test("prefilter really prunes: bloom-negative fraction is large on fresh data") {
    import spark.implicits._
    val corpus = (0L until 500L).map(i => (i, s"catalog only ${i}")).toDF("doc_id", "text")
    val catalog = Dedup.dedupCatalog(corpus, "text", xxhash64(_))
    val n = catalog.count()
    val filter = Bloom.build(
      catalog.select(Bloom.keyHash(col("fp"), col("h2")).as("__h")), "__h", n, 0.01)
    val crawl = (0L until 1000L).map(i => (i, s"brand new ${i}")).toDF("doc_id", "text")
    val maybe = crawl
      .withColumn("__fp", graft.functions.GraftFunctions.fingerprint64(col("text")))
      .withColumn("__h2", xxhash64(col("text")))
      .filter(filter.mightContain(Bloom.keyHash(col("__fp"), col("__h2"))))
      .count()
    assert(maybe <= 50, s"$maybe of 1000 fresh docs bloom-positive (expect ~1%)")
  }
}
