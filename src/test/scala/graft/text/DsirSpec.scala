package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.GraftHash
import org.apache.spark.unsafe.types.UTF8String

/** DSIR importance resampling (arXiv:2302.03169): hand-checked smoothed
  * log-ratio arithmetic, ranking direction, and the zero-token edge. The
  * full-corpus result is oracle-gated (`dsir_logratios`/`dsir_select`). */
class DsirSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // small bucket space where a/b/c provably don't collide
  private val B = 64
  private def bucket(w: String): Long =
    GraftHash.fingerprint64(UTF8String.fromString(w)) % B

  // Spark's round() is HALF_UP over the exact decimal expansion
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val raw = Seq((1L, "a a b"), (2L, "c c c"), (3L, "   "))
    .toDF("doc_id", "text")
  private val target = Seq((10L, "a a a")).toDF("doc_id", "text")

  test("log-ratios match the smoothed closed form, dense over all buckets") {
    assert(Set(bucket("a"), bucket("b"), bucket("c")).size == 3)
    val lrs = Dsir.logRatios(raw, target, "text", buckets = B)
    assert(lrs.count() == B) // dense: every bucket present exactly once
    val byBucket = lrs.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // raw tokens: a,a,b,c,c,c (N_r=6); target: a,a,a (N_t=3)
    def lr(tn: Long, rn: Long): Double =
      r6(math.log((tn + 1).toDouble / (3 + B)) -
        math.log((rn + 1).toDouble / (6 + B)))
    assert(byBucket(bucket("a")) == lr(3, 2))
    assert(byBucket(bucket("b")) == lr(0, 1))
    assert(byBucket(bucket("c")) == lr(0, 3))
    // an untouched bucket carries the both-unseen default, not 0
    val untouched = (0L until B).find(b =>
      !Set(bucket("a"), bucket("b"), bucket("c")).contains(b)).get
    assert(byBucket(untouched) == lr(0, 0))
  }

  test("weights sum per-token ratios exactly; target-like docs rank first; token-less docs drop") {
    val lrs = Dsir.logRatios(raw, target, "text", buckets = B)
    val byBucket = lrs.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = Dsir.importanceWeights(raw, "doc_id", "text", lrs, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(1L, 2L)) // doc 3 has no tokens → no row
    // decimal sums of 6-dp terms are exact — assert equality, not tolerance
    assert(w(1L) == BigDecimal(byBucket(bucket("a"))) * 2 + BigDecimal(byBucket(bucket("b"))))
    assert(w(2L) == BigDecimal(byBucket(bucket("c"))) * 3)
    assert(w(1L) > w(2L)) // shares 'a' with the target vs unseen-only
    val top = Dsir.selectTopK(raw, target, "doc_id", "text", k = 1, buckets = B)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L))
  }
}
