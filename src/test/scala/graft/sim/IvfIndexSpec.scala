package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private def emb =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"

  test("persistent index reproduces the in-memory IVF path exactly") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 8)

    // same centroids → same probes → same candidates → identical top-k
    val centroids = IvfIndex.readCentroids(spark, dir)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val fromIndex = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 3).collect().map(_.toSeq).toSet
    val inMemory = Similarity.ivfTopKTrained(emb, q, "vec_id", "embedding",
      k = 10, centroids, nProbe = 3).collect().map(_.toSeq).toSet
    assert(fromIndex == inMemory && fromIndex.nonEmpty)
  }

  test("probe scans carry a list partition filter (pruned, not full)") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 8)
    val q = emb.filter(col("vec_id") === 0)
    val result = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 2)
    assert(result.count() == 5)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"probe scan must partition-prune on list:\n$plan")

    // functional pruning check: a one-list filter reads strictly fewer
    // files than the index holds (each list is its own directory)
    val all = IvfIndex.vectors(spark, dir)
      .select(input_file_name()).distinct().count()
    val one = IvfIndex.vectors(spark, dir).filter(col("list") === 0)
      .select(input_file_name()).distinct().count()
    assert(one < all, s"one list read $one of $all files")
  }

  test("appendVectors grows the index without retraining") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") < 400)
    IvfIndex.build(base, "vec_id", "embedding", dir, nLists = 8)
    val before = IvfIndex.readCentroids(spark, dir)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", dir)
    // quantizer untouched; the full corpus is now indexed
    assert(IvfIndex.readCentroids(spark, dir).map(_.toSeq).toSeq ==
      before.map(_.toSeq).toSeq)
    assert(IvfIndex.vectors(spark, dir).count() == emb.count())
    // an appended vector is findable: its exact duplicate is itself — use
    // a query FROM the appended range and check it gets k neighbors
    val q = emb.filter(col("vec_id") === 450)
    assert(IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 3, nProbe = 8).count() == 3)
  }

  test("per-list compaction collapses appends and duplicates, preserves results") {
    val dir = freshDir()
    IvfIndex.build(emb.filter(col("vec_id") < 300), "vec_id", "embedding",
      dir, nLists = 4)
    // several appends (a streaming ingest's shape) + one REPLAYED append
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400),
      "vec_id", "embedding", dir)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", dir)
    IvfIndex.appendVectors( // replay: duplicates, which readers tolerate
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", dir)

    val q = emb.filter(col("vec_id") % 100 === 0)
    val before = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    // duplicate rows exist but no neighbor is seated twice
    val seats = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 4).groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(seats == 0)

    // compact only the overfull lists (LSM-style): row count collapses
    // to the distinct ids, results identical
    val over = IvfIndex.listFileCounts(spark, dir)
      .filter(_._2 > 1).keys.toSeq
    assert(over.nonEmpty)
    IvfIndex.compact(spark, dir, lists = Some(over))
    assert(IvfIndex.listFileCounts(spark, dir).forall(_._2 == 1))
    assert(IvfIndex.vectors(spark, dir).count() == emb.count())
    val after = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("streaming embedding ingest: foreachBatch appends land in the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    IvfIndex.build(emb.filter(col("vec_id") < 450), "vec_id", "embedding",
      dir, nLists = 4)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val late = emb.filter(col("vec_id") >= 450)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    input.addData(late.toSeq: _*)
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IvfIndex.appendVectors(batch, "vec_id", "embedding", dir)
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(IvfIndex.vectors(spark, dir).count() == emb.count())
    val probe = IvfIndex.topK(spark, dir,
      emb.filter(col("vec_id") === 460), "vec_id", "embedding",
      k = 3, nProbe = 4)
    assert(probe.count() == 3)
  }

  test("layout guards: no meta fails loudly, double build refuses") {
    val dir = freshDir()
    val e = intercept[IllegalStateException] {
      IvfIndex.topK(spark, dir, emb.limit(1), "vec_id", "embedding", k = 1)
    }
    assert(e.getMessage.contains("build() it first"))
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    intercept[IllegalArgumentException] {
      IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    }
  }
}
