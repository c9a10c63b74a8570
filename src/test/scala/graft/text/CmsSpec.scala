package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the cross-layer hashing contract behind the `ngram_cms` gate
  * row: the `count_min_sketch` AGGREGATE adds string values as their
  * UTF-8 bytes, and the driver-side `CountMinSketch.estimateCount`
  * probe must hash a JVM String identically — if either side's hashing
  * changed, every estimate would be an unrelated counter and the CMS
  * lower bound (est ≥ true, ALWAYS, not probabilistic) would break.
  * The oracle row proves this tri-scale end to end; this spec pins the
  * mechanism on a planted corpus where exact counts are known by
  * construction (including non-ASCII items). */
class CmsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("aggregate-side adds and driver-side probes hash identically; bounds hold") {
    val items =
      Seq.fill(500)("alpha") ++ Seq.fill(120)("beta") ++
        Seq.fill(7)("fé 世界") ++ Seq.fill(1)("rare")
    val df = scala.util.Random.shuffle(items).toDF("item")
      .repartition(8) // merge path: per-partition sketches combine
    val bytes = df
      .agg(expr("count_min_sketch(item, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(sk.totalCount() == items.size)
    val slack = math.ceil(0.001 * sk.totalCount()).toLong
    for ((item, n) <- Seq(("alpha", 500L), ("beta", 120L),
        ("fé 世界", 7L), ("rare", 1L))) {
      val est = sk.estimateCount(item)
      assert(est >= n, s"CMS lower bound broken for '$item': $est < $n")
      assert(est <= n + slack, s"'$item' over-estimated: $est > $n + $slack")
    }
    // an absent item estimates within the additive error of zero
    assert(sk.estimateCount("never seen") <= slack)
  }
}
