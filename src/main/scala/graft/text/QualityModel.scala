package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the FineWeb-Edu / DCLM move: train a
  * small linear classifier on a labeled sample, then score the whole
  * corpus with it and keep what clears a threshold.
  *
  * Split by scale, deliberately:
  *  - TRAINING runs on the labeled sample (thousands to millions of rows)
  *    through Spark ML's distributed LBFGS — fine at any sample size; the
  *    fitted model collapses to O(features) doubles on the driver.
  *  - SCORING is the 100 TB path, so it is a PURE COLUMN EXPRESSION: the
  *    weight vector inlines as literals into a codegen'd dot product +
  *    sigmoid over the feature columns. No model object, no UDF, no ML
  *    vector types anywhere near the big scan.
  */
object QualityModel {

  /** The feature vector: cheap scan-time text statistics, all codegen'd
    * [[TextOps]] expressions. Order is the contract between training and
    * scoring. */
  val FeatureNames: Seq[String] =
    Seq("f_len", "f_stop", "f_punct", "f_mean_tok", "f_rep")

  def featureColumns(text: Column): Seq[Column] = Seq(
    least(TextOps.tokenCount(text).cast("double") / 100.0, lit(1.0)),
    TextOps.stopwordRatio(text),
    TextOps.punctRatio(text),
    least(TextOps.meanTokenLen(text) / 10.0, lit(1.0)),
    TextOps.repeatedTokenRatio(text))

  def withFeatures(df: DataFrame, textCol: String): DataFrame =
    FeatureNames.zip(featureColumns(col(textCol)))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** Fitted model: plain doubles, serializable, driver-small. */
  final case class LinearModel(weights: Seq[Double], intercept: Double) {
    require(weights.length == FeatureNames.length,
      s"expected ${FeatureNames.length} weights, got ${weights.length}")
  }

  /** Train a logistic-regression quality model on a labeled sample
    * (`labelCol` ∈ {0.0, 1.0}). Distributed LBFGS over however many
    * labeled rows exist; the result is just the weight doubles. */
  def train(
      labeled: DataFrame, textCol: String, labelCol: String,
      regParam: Double = 0.01, maxIter: Int = 100): LinearModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = withFeatures(labeled, textCol)
      .select(array_to_vector(array(FeatureNames.map(col): _*)).as("features"),
        col(labelCol).cast("double").as("label"))
    val fit = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
      .fit(prepared)
    LinearModel(fit.coefficients.toArray.toSeq, fit.intercept)
  }

  /** The inlined linear part (`intercept + Σ wᵢ·fᵢ`, summed LEFT TO
    * RIGHT in [[FeatureNames]] order — the accumulation order is part of
    * the cross-engine contract: with exact feature doubles, the margin is
    * bit-reproducible). Sign decides the predicted label, so margin-based
    * filtering never needs the transcendental sigmoid. */
  def marginColumn(text: Column, model: LinearModel): Column =
    featureColumns(text).zip(model.weights)
      .map { case (f, w) => f * w }
      .foldLeft(lit(model.intercept))(_ + _)

  /** Sigmoid of the inlined dot product — the scoring expression. Pure
    * arithmetic over the feature expressions: whole-stage codegen, zero
    * shuffles, nothing but the scan at any corpus size. */
  def scoreColumn(text: Column, model: LinearModel): Column = {
    val dot = marginColumn(text, model)
    lit(1.0) / (lit(1.0) + exp(-dot))
  }

  /** Corpus filter: keep docs the model scores ≥ threshold. */
  def filterByModel(
      df: DataFrame, textCol: String, model: LinearModel,
      threshold: Double): DataFrame =
    df.filter(scoreColumn(col(textCol), model) >= threshold)
}
