package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StreamingSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def items(xs: (String, Int)*) =
    xs.flatMap { case (s, n) => Seq.fill(n)(s) }.toDF("gram")

  test("merged per-batch sketches equal ONE sketch of the concatenated corpus, byte for byte") {
    val dir = Files.createTempDirectory("graft-cms-stream").toString
    val b1 = items("alpha" -> 50, "beta" -> 20, "gamma" -> 5)
    val b2 = items("alpha" -> 30, "delta" -> 40)
    val m1 = StreamingSketch.applyBatch(b1, dir, added = 1L)
    assert(m1.estimateCount("alpha") >= 50)
    val m2 = StreamingSketch.applyBatch(b2, dir, added = 2L)

    // the whole point: CMS counters are sums, so merge-of-batches IS the
    // sketch of the concatenation — exactly, not approximately
    val whole = b1.unionByName(b2)
      .agg(expr("count_min_sketch(gram, 0.001d, 0.99d, 42)")).head.getAs[Array[Byte]](0)
    val ref = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(whole))
    val mergedBytes = { val o = new java.io.ByteArrayOutputStream(); m2.writeTo(o); o.toByteArray }
    val refBytes = { val o = new java.io.ByteArrayOutputStream(); ref.writeTo(o); o.toByteArray }
    assert(java.util.Arrays.equals(mergedBytes, refBytes))

    // the persisted copy is the merged one, and estimates honor the
    // CMS guarantee on true counts of the concatenated stream
    val persisted = StreamingSketch.read(spark, dir).get
    assert(persisted.totalCount() == 145L)
    assert(persisted.estimateCount("alpha") >= 80L)
    assert(persisted.estimateCount("delta") >= 40L)
    assert(StreamingSketch.estimate(spark, dir, "alpha") >= 80L)
  }

  test("replayed batch (added not above lastAdded) merges at most once") {
    val dir = Files.createTempDirectory("graft-cms-replay").toString
    val b = items("x" -> 10)
    val _ = StreamingSketch.applyBatch(b, dir, added = 5L)
    val after = StreamingSketch.applyBatch(b, dir, added = 5L) // replay
    assert(after.totalCount() == 10L, "replay must be a no-op")
    assert(StreamingSketch.read(spark, dir).get.totalCount() == 10L)
    val _2 = StreamingSketch.applyBatch(b, dir, added = 6L) // genuine next batch
    assert(StreamingSketch.read(spark, dir).get.totalCount() == 20L)
  }

  test("geometry is meta-derived: later batches fold under the CREATED geometry") {
    val dir = Files.createTempDirectory("graft-cms-geom").toString
    val _ = StreamingSketch.applyBatch(items("a" -> 3), dir, added = 1L,
      eps = 0.01, confidence = 0.9, seed = 7)
    // caller passes different (default) values — meta wins, merge stays sound
    val m = StreamingSketch.applyBatch(items("a" -> 2), dir, added = 2L)
    assert(m.estimateCount("a") >= 5L)
    val (meta, _) = StreamingSketch.readAll(spark, dir).get
    assert(meta.eps == 0.01 && meta.confidence == 0.9 && meta.seed == 7)
  }

  test("empty store: read None, estimate 0") {
    val dir = Files.createTempDirectory("graft-cms-empty").toString
    assert(StreamingSketch.read(spark, dir).isEmpty)
    assert(StreamingSketch.estimate(spark, dir, "anything") == 0L)
  }

  test("wordNgramItems matches the ngram_cms gram stream shape") {
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val grams = StreamingSketch.wordNgramItems(docs, "text", 3)
      .as[String].collect().sorted.toSeq
    assert(grams == Seq("a b c", "b c d")) // doc 2 is below n tokens
  }
}
