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
    // AQE wraps scans in adaptive nodes the plan collect can't reach
    // until execution; the census is about static shape, so pin it on
    // the non-adaptive plan (same convention as graft.Explain) — both
    // the frame construction AND the executedPlan access run with AQE
    // off (the physical plan is built lazily at first access)
    // restore whatever the session previously had, not a hardcoded
    // "true" — a suite configured with AQE off must not see the setting
    // silently flipped by this test
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val result = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
        k = 5, nProbe = 2)
      assert(result.count() == 5)
      // a NON-EMPTY PartitionFilters bracket naming list: every
      // partitioned scan prints "PartitionFilters: [...]", so the assert
      // must inspect the bracket CONTENT, not just the label's presence
      val plan = result.queryExecution.executedPlan.toString
      val partFilters = """PartitionFilters: \[([^\]]*)\]""".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(partFilters.exists(f => f.contains("list") && f.trim.nonEmpty),
        s"probe scan must carry a non-empty list partition filter, " +
          s"got brackets: $partFilters\n$plan")

      // functional pruning check on the ACTUAL probe plan: the files the
      // topK scan reads are a strict subset of the index's files
      // (nProbe=2 of 8 lists; each list is its own directory)
      val allFiles = IvfIndex.vectors(spark, dir)
        .select(input_file_name()).distinct().count()
      val scans = result.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.output.exists(_.name == "vec") => s
      }
      assert(scans.nonEmpty, "expected a vectors file scan in the probe plan")
      val probedFiles = scans.map(_.selectedPartitions.totalNumberOfFiles).sum
      assert(probedFiles < allFiles,
        s"probe read $probedFiles of $allFiles index files")
    } finally prevAqe match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
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

  // ----------------------------------------------------------- PQ leg

  private def bytesUnder(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length() else 0L }
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  test("PQ leg: ADC probe + exact re-rank tracks the raw probe; codes are much smaller") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 8)
    IvfIndex.buildPq(spark, dir, m = 16, k = 16)
    val q = emb.filter(col("vec_id") % 100 === 0)

    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pq = IvfIndex.topKPq(spark, dir, q, "vec_id", "embedding",
        k = 10, nProbe = 3, rerank = 50)
      val raw = IvfIndex.topK(spark, dir, q, "vec_id", "embedding",
        k = 10, nProbe = 3)
      // per-query completeness: every query seats a full top-10
      assert(pq.groupBy("query_id").count()
        .filter(col("count") =!= 10).count() == 0)
      // the exact re-rank over a 5x shortlist recovers most of what the
      // raw probe finds over the SAME probed lists (loose floor — a
      // broken ADC or LUT lands near 0)
      val hits = pq.select("query_id", "neighbor_id")
        .intersect(raw.select("query_id", "neighbor_id")).count()
      val total = raw.count()
      assert(total > 0 && hits.toDouble / total >= 0.5,
        s"pq-vs-raw agreement ${hits.toDouble / total}")

      // the ADC scan is list-pruned like the raw probe: the code files
      // read are a strict subset of the code store
      val allCodeFiles = IvfIndex.codes(spark, dir)
        .select(input_file_name()).distinct().count()
      val scans = pq.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.output.exists(_.name == "pq_codes") => s
      }
      assert(scans.nonEmpty, "expected a codes file scan in the PQ probe plan")
      val probedFiles = scans.map(_.selectedPartitions.totalNumberOfFiles).sum
      assert(probedFiles < allCodeFiles,
        s"ADC probe read $probedFiles of $allCodeFiles code files")
    } finally prevAqe match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }

    // compression-ratio pin: 16-byte codes vs 64×8-byte float vectors is
    // 32x logical; parquet overhead included, the code store must still
    // be at least 4x smaller on disk
    val vb = bytesUnder(s"$dir/vectors")
    val cb = bytesUnder(s"$dir/codes")
    assert(vb > 0 && cb > 0 && cb * 4 <= vb, s"codes $cb B vs vectors $vb B")
  }

  test("PQ leg: appendVectors keeps codes in sync; compact covers both legs") {
    val dir = freshDir()
    IvfIndex.build(emb.filter(col("vec_id") < 300), "vec_id", "embedding",
      dir, nLists = 4)
    IvfIndex.buildPq(spark, dir, m = 16, k = 16)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400),
      "vec_id", "embedding", dir)
    IvfIndex.appendVectors( // replayed append: duplicates in BOTH legs
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", dir)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") >= 400), "vec_id", "embedding", dir)
    assert(IvfIndex.codes(spark, dir).count() ==
      IvfIndex.vectors(spark, dir).count())

    val q = emb.filter(col("vec_id") % 100 === 0)
    val before = IvfIndex.topKPq(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    // duplicates never seat a neighbor twice (collapse before ranking)
    assert(before.nonEmpty)

    IvfIndex.compact(spark, dir)
    // both legs collapsed to the distinct corpus, results identical
    assert(IvfIndex.vectors(spark, dir).count() == emb.count())
    assert(IvfIndex.codes(spark, dir).count() == emb.count())
    val after = IvfIndex.topKPq(spark, dir, q, "vec_id", "embedding",
      k = 10, nProbe = 4).collect().map(_.toSeq).toSet
    assert(after == before)
  }

  test("PQ leg: crashed buildPq fails code readers loudly; the raw index keeps serving") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    IvfIndex.buildPq(spark, dir, m = 16, k = 16)
    // simulate the crash window: codes + model present, commit marker gone
    assert(new java.io.File(dir, "_graft_ivf_pq.json").delete())
    val e = intercept[IllegalStateException] {
      IvfIndex.codes(spark, dir).count()
    }
    assert(e.getMessage.contains("buildPq() it first"))
    assertThrows[IllegalStateException] { IvfIndex.readPqModel(spark, dir) }
    assertThrows[IllegalStateException] {
      IvfIndex.topKPq(spark, dir, emb.limit(1), "vec_id", "embedding", k = 1)
    }
    // the raw leg is unaffected
    assert(IvfIndex.topK(spark, dir, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 3, nProbe = 4).count() == 3)
    // re-building the leg clears the remnants and completes
    IvfIndex.buildPq(spark, dir, m = 16, k = 16)
    assert(IvfIndex.codes(spark, dir).count() == emb.count())
    // a live leg refuses a second buildPq
    intercept[IllegalArgumentException] {
      IvfIndex.buildPq(spark, dir, m = 16, k = 16)
    }
  }

  test("dimension mismatches fail loudly instead of silently mis-scoring") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    // a wrong-dim vector would score NULL against every centroid and
    // silently land in the last list — the fused guard must throw instead
    val short = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val e1 = intercept[Exception] {
      IvfIndex.appendVectors(short, "vec_id", "embedding", dir)
    }
    assert(e1.getMessage != null && e1.getMessage.contains("expects dim 64"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      IvfIndex.topK(spark, dir, short.limit(1), "vec_id", "embedding", k = 1)
        .collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("expects dim 64"),
      s"got: ${e2.getMessage}")
  }

  test("a crashed build (data, no meta) fails readers and rebuilds cleanly") {
    val dir = freshDir()
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    // simulate the crash window: data present, commit marker gone
    val f = new java.io.File(dir, "_graft_ivf.json")
    assert(f.delete())
    val e = intercept[IllegalStateException] {
      IvfIndex.vectors(spark, dir).count()
    }
    assert(e.getMessage.contains("build() it first"))
    // re-building clears the remnants and completes
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)
    assert(IvfIndex.vectors(spark, dir).count() == emb.count())
    // but build never deletes a dir holding non-index content
    val dir2 = freshDir()
    new java.io.File(dir2).mkdirs()
    assert(new java.io.File(dir2, "precious.txt").createNewFile())
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.build(emb, "vec_id", "embedding", dir2, nLists = 4)
    }
    assert(e2.getMessage.contains("non-index entries"))
    assert(new java.io.File(dir2, "precious.txt").exists())
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
