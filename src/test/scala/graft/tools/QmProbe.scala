package graft.tools
import org.apache.spark.sql.functions._
import graft.text.{QualityModel, TextOps}

/** Measures the trained quality model's train/holdout accuracy at each
  * test SF — the numbers behind the `quality_model` contract floors
  * (`SparkEntry.QmTrainAccFloor` 0.85 / `QmHoldoutAccFloor` 0.80;
  * measured 0.96–0.99 across sf0.001/0.01/0.1). Run with
  * `sbt "Test/runMain graft.tools.QmProbe"` when re-tuning floors. */
object QmProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val labeled = graft.sources.Tables.read(spark, s"/root/testdata/sf$sf", "documents")
        .withColumn("label", (TextOps.qualityScore(col("text")) >= 0.5).cast("double"))
        .withColumn("bucket", pmod(col("doc_id"), lit(5)))
      val model = QualityModel.train(labeled.filter(col("bucket") < 4), "text", "label")
      val scored = labeled.select(col("label"), col("bucket"),
        QualityModel.scoreColumn(col("text"), model).as("score"))
      val hit = ((col("score") >= 0.5) === (col("label") === 1.0)).cast("long")
      val r = scored.agg(
        (sum(when(col("bucket") < 4, hit).otherwise(0L)) / sum(when(col("bucket") < 4, 1L).otherwise(0L))).as("train"),
        (sum(when(col("bucket") === 4, hit).otherwise(0L)) / sum(when(col("bucket") === 4, 1L).otherwise(0L))).as("hold")).head()
      println(f"sf$sf train=${r.getDouble(0)}%.4f holdout=${r.getDouble(1)}%.4f")
    }
    spark.stop()
  }
}
