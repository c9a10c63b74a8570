package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class StreamingHistogramSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("merged per-batch histograms equal ONE histogram of the concatenation, byte for byte") {
    val b1 = (1L to 500L).toDF("v")
    val b2 = (250L to 900L).toDF("v")
    val dir = Files.createTempDirectory("graft-hist-stream").toString
    val _ = StreamingHistogram.applyBatch(b1, dir, added = 1L)
    val merged = StreamingHistogram.applyBatch(b2, dir, added = 2L)
    val dirW = Files.createTempDirectory("graft-hist-whole").toString
    val whole = StreamingHistogram.applyBatch(
      b1.unionByName(b2), dirW, added = 1L)
    assert(merged.toSeq == whole.toSeq) // counts are sums — exact merge
    assert(StreamingHistogram.totalCount(spark, dir) == 500L + 651L)
    // the persisted files are byte-identical modulo the lastAdded tag —
    // compare the counts through the reader
    assert(StreamingHistogram.readAll(spark, dir).get._2.toSeq ==
      StreamingHistogram.readAll(spark, dirW).get._2.toSeq)
  }

  test("quantile brackets contain the exact discrete quantile, with the bin-width guarantee") {
    val vals = (1L to 1000L) ++ (1L to 100L).map(_ * 37L)
    val dir = Files.createTempDirectory("graft-hist-q").toString
    val _ = StreamingHistogram.applyBatch(vals.toDF("v"), dir, added = 1L)
    val sorted = vals.sorted
    for (q <- Seq(0.5, 0.9, 0.99, 1.0)) {
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1).toDouble
      val Some((lo, hi)) = StreamingHistogram.quantileBracket(spark, dir, q)
      assert(lo <= exact && exact < hi, s"q=$q exact=$exact bracket=($lo,$hi)")
      // the bracket's width is the bin property, not data-driven: with
      // log1p bins, (1 + hi)/(1 + lo) = e^(1/binsPerLn) exactly
      assert(math.abs((1.0 + hi) / (1.0 + lo) -
        math.exp(1.0 / StreamingHistogram.DefaultBinsPerLn)) < 1e-9)
    }
  }

  test("replayed batch merges at most once; negatives clamp to bin 0; nulls ignored") {
    val dir = Files.createTempDirectory("graft-hist-replay").toString
    val b = Seq(Some(5L), Some(-3L), None).toDF("v")
    val _ = StreamingHistogram.applyBatch(b, dir, added = 7L)
    assert(StreamingHistogram.totalCount(spark, dir) == 2L) // null ignored
    val after = StreamingHistogram.applyBatch(b, dir, added = 7L) // replay
    assert(after.sum == 2L)
    assert(StreamingHistogram.readAll(spark, dir).get._2(0) == 1L) // -3 clamped
  }

  test("layout is meta-derived: later batches fold under the CREATED geometry") {
    val dir = Files.createTempDirectory("graft-hist-geom").toString
    val _ = StreamingHistogram.applyBatch(
      Seq(10L).toDF("v"), dir, added = 1L, binsPerLn = 4, maxBins = 64)
    val m = StreamingHistogram.applyBatch(
      Seq(20L).toDF("v"), dir, added = 2L) // divergent defaults ignored
    assert(m.length == 64)
    assert(StreamingHistogram.readAll(spark, dir).get._1.binsPerLn == 4)
  }
}
