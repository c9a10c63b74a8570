package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TrainingPipelineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    // plant exact duplicates so dedup has work
    base.unionByName(base.filter($"doc_id" < 25)
      .select(($"doc_id" + 50000).as("doc_id"), $"text")).cache()
  }

  test("curation: survivors pass all filters; dups collapsed to min id; one shuffle") {
    val curated = TrainingPipeline.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.5).cache()
    val rows = curated.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_pred") == "en")
      assert(r.getAs[Double]("quality") >= 0.5)
      assert(r.getAs[Long]("doc_id") < 50000) // dup copies never win over min id
    }
    // filters commute with exact dedup (identical text, identical metrics)
    val after = TrainingPipeline.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.5, filtersFirst = false)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == after)

    // plan: exactly one exchange (the dedup fingerprint window/groupBy)
    val plan = TrainingPipeline.curate(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 2, s"too many shuffles:\n$plan")

    val stats = TrainingPipeline.stats(curated).collect().head
    assert(stats.getLong(0) == rows.length)
    assert(stats.getLong(1) > 0)
  }

  test("near-dedup stage: planted exact copies never survive the full chain") {
    val full = TrainingPipeline.curateWithNearDedup(docs, "doc_id", "text",
      lang = "en", minQuality = 0.5, jaccardThreshold = 0.9)
      .collect()
    assert(full.nonEmpty)
    val ids = full.map(_.getLong(0)).toSet
    // planted copies (id+50000) cluster with their smaller base id
    assert(ids.forall(_ < 50000))
    // near-dedup only removes rows relative to the filtered+exact stage
    val exactOnly = TrainingPipeline.curate(docs, "doc_id", "text",
      lang = "en", minQuality = 0.5).count()
    assert(full.length <= exactOnly)
    full.foreach { r =>
      assert(r.getAs[String]("lang_pred") == "en")
      assert(r.getAs[Double]("quality") >= 0.5)
    }
  }
}
