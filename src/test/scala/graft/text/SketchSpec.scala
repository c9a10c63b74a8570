package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The corpus_sketch gate query oracles its error-bound contract as
  * literal-TRUE booleans (sketch internals are not portable SQL); this
  * pins the same accuracy contract directly against exact answers. */
class SketchSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")

  test("HLL distinct estimate within the configured relative error") {
    val exact = docs.agg(countDistinct(col("text"))).head.getLong(0)
    val approx = docs.agg(approx_count_distinct(col("text"), rsd = 0.02))
      .head.getLong(0)
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel <= 0.06, s"approx $approx vs exact $exact (rel err $rel)")
  }

  test("approximate length quantiles bracket the exact percentiles") {
    val lens = docs.select(length(col("text")).cast("double").as("len"))
    val Seq(p50, p90) = lens
      .agg(expr("percentile(len, array(0.5, 0.9))")).head
      .getSeq[Double](0).toSeq
    val Seq(a50, a90) = lens
      .agg(percentile_approx(col("len"), array(lit(0.5), lit(0.9)), lit(5000)))
      .head.getSeq[Double](0).toSeq
    // with accuracy 5000 on a small corpus the sketch is near-exact
    assert(math.abs(a50 - p50) / math.max(p50, 1.0) <= 0.05, s"$a50 vs $p50")
    assert(math.abs(a90 - p90) / math.max(p90, 1.0) <= 0.05, s"$a90 vs $p90")
  }

  test("sketch aggregation is deterministic across partitionings") {
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy(col("source"))
        .agg(approx_count_distinct(col("text"), rsd = 0.02).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(docs.repartition(2)) == run(docs.repartition(13)))
  }
}
