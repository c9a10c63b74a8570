package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualityModelSpec extends AnyFunSuite with SparkTestBase {

  private def docsDf =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")

  test("trained model separates heuristic labels and scores are pure-column") {
    // labels from the quality heuristic: the classifier must recover the
    // boundary it was taught from the same underlying features
    val labeled = docsDf.withColumn("label",
      (TextOps.qualityScore(col("text")) >= 0.5).cast("double"))
    val nPos = labeled.filter(col("label") === 1.0).count()
    assert(nPos > 20 && nPos < labeled.count() - 20, "labels must be mixed")

    val model = QualityModel.train(labeled, "text", "label")
    val scored = labeled.select(col("doc_id"), col("label"),
      QualityModel.scoreColumn(col("text"), model).as("score"))

    // threshold-0.5 accuracy well above chance on the training labels
    val agree = scored.filter(
      (col("score") >= 0.5) === (col("label") === 1.0)).count()
    val acc = agree.toDouble / scored.count()
    assert(acc > 0.9, s"train accuracy $acc")

    // scoring is deterministic and partitioning-independent
    val s1 = scored.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s2 = labeled.repartition(17)
      .select(col("doc_id"), QualityModel.scoreColumn(col("text"), model))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)

    // the scoring plan is scan-only: no exchanges, no ML vector types
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoring must not shuffle")

    // filterByModel keeps exactly the thresholded set
    val kept = QualityModel.filterByModel(labeled, "text", model, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == s1.filter(_._2 >= 0.5).keySet)
  }

  test("margin and sigmoid score agree on the decision boundary") {
    import spark.implicits._
    // the ACTUAL gate head — referencing the shared constants keeps this
    // spec validating whatever quality_model_fixed ships
    val m = QualityModel.LinearModel(
      graft.SparkEntry.FixedQualityWeights, graft.SparkEntry.FixedQualityIntercept)
    val scored = docsDf.select(
      QualityModel.marginColumn(col("text"), m).as("margin"),
      QualityModel.scoreColumn(col("text"), m).as("score"))
    // sigmoid is monotone: score >= 0.5 exactly when margin >= 0, and the
    // score is always a valid probability
    val bad = scored.filter(
      ((col("score") >= 0.5) =!= (col("margin") >= 0.0)) ||
        col("score") < 0.0 || col("score") > 1.0).count()
    assert(bad == 0)
    // both classes occur (the pinned gate head is not degenerate)
    val kept = scored.filter(col("margin") >= 0.0).count()
    assert(kept > 0 && kept < scored.count())
  }

  test("model weights are O(features) plain doubles") {
    val m = QualityModel.LinearModel(Seq(0.1, -0.2, 0.3, 0.0, -0.5), 0.7)
    assert(m.weights.length == QualityModel.FeatureNames.length)
    require(
      try { QualityModel.LinearModel(Seq(1.0), 0.0); false }
      catch { case _: IllegalArgumentException => true })
  }
}
