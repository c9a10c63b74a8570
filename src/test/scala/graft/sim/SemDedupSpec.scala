package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the SemDeDup drop rule (exists lower-id cluster member with
  * cosine ≥ threshold → dropped) on hand-built geometry with FIXED
  * centroids, the valve's conservative failure mode, and the recall
  * behavior on the real embeddings table. */
class SemDedupSpec extends AnyFunSuite with SparkTestBase {

  // two well-separated clusters on the axes; centroids fixed so cluster
  // assignment is not at the mercy of k-means
  private val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)),   // cluster 0
      (2L, Array(1.0f, 0.012f, 0.0f)),  // ≈ dup of 1 (cosine ≈ 1)
      (3L, Array(0.9f, 0.44f, 0.0f)),   // cluster 0, NOT a dup (≈ 26°)
      (4L, Array(0.0f, 1.0f, 0.01f)),   // cluster 1
      (5L, Array(0.0f, 1.0f, 0.011f)),  // ≈ dup of 4
      (6L, Array(0.01f, 1.0f, 0.0f))    // ≈ dup of 4 AND 5
    ).toDF("vec_id", "embedding")
  }

  test("drop rule: lowest id survives, chains collapse to the oldest member") {
    val report = SemDedup.semDupReport(
      corpus, "vec_id", "embedding", centroids, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dropped → smallest duplicate-of id
    assert(report == Map(2L -> 1L, 5L -> 4L, 6L -> 4L))

    val kept = SemDedup.semDedup(
      corpus, "vec_id", "embedding", centroids, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("cross-cluster near-dups are NOT dropped (clustering is the recall bound)") {
    import spark.implicits._
    // two nearly-identical vectors placed in DIFFERENT clusters by the
    // fixed centroids: the diagonal direction assigns by tiny margins
    val split = Seq(
      (1L, Array(0.71f, 0.70f, 0.0f)), // cluster 0 (barely)
      (2L, Array(0.70f, 0.71f, 0.0f))  // cluster 1 (barely)
    ).toDF("vec_id", "embedding")
    val report = SemDedup.semDupReport(
      split, "vec_id", "embedding", centroids, threshold = 0.99)
    assert(report.count() == 0) // missed by design — documented recall trade
  }

  test("oversized clusters are skipped whole: members all survive") {
    val report = SemDedup.semDupReport(
      corpus, "vec_id", "embedding", centroids, threshold = 0.999,
      maxClusterSize = 2)
    // cluster 0 has 3 members, cluster 1 has 3 → both over the cap of 2
    assert(report.count() == 0)
    assert(SemDedup.semDedup(corpus, "vec_id", "embedding", centroids,
      0.999, maxClusterSize = 2).count() == corpus.count())
  }

  test("real embeddings: report is deterministic and survivors + dropped partition the corpus") {
    val e = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.ivfTrainAuto(e, "embedding", nLists = 8)
    def run() = SemDedup.semDupReport(e, "vec_id", "embedding", cents, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = run()
    assert(run() == r1) // deterministic across runs/partitionings
    val dropped = r1.map(_._1)
    val kept = SemDedup.semDedup(e, "vec_id", "embedding", cents, 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dropped).isEmpty)
    assert(kept.size + dropped.size == e.count())
    // every dropped doc's keeper is itself kept (keepers are lower-id and
    // can only be dropped by a yet-lower id, which would then be ITS
    // keeper — min-id chains ground out)… keeper may be dropped when it
    // duplicates an even older doc; assert the weaker invariant: keeper < dropped
    r1.foreach { case (d, k) => assert(k < d) }
  }

  // ------------------------------------------- incremental (IVF-backed)

  private def embAll =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))

  private def freshIdx() =
    java.nio.file.Files.createTempDirectory("graft-semdd-idx").toString + "/idx"

  test("incremental: pruned probe equals the unpruned brute-force semantics; planted copies drop; index grows by the survivors") {
    val idx = freshIdx()
    val base = embAll.filter(col("vec_id") % 2 === 0)
    IvfIndex.build(base, "vec_id", "embedding", idx, nLists = 8)
    val cents = IvfIndex.readCentroids(spark, idx)
    val planted = base.filter(col("vec_id") % 14 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
    val batch = embAll.filter(col("vec_id") % 2 === 1).unionByName(planted)
    val before = IvfIndex.vectors(spark, idx).count()

    val delivered = scala.collection.mutable.Set.empty[Long]
    val surv = SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding",
      threshold = 0.95,
      deliver = d => delivered ++= d.select("vec_id").collect().map(_.getLong(0)))
    val survIds = surv.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(delivered == survIds && survIds.nonEmpty)
    // every planted copy (identical vector → original's cluster) dropped
    assert(survIds.forall(_ < 100000000L))
    // the index grew by exactly the survivor set
    assert(IvfIndex.vectors(spark, idx).count() == before + survIds.size)

    // EXPECTED set, brute-forced with no pruning: stage-1 in-batch
    // survivors minus those with an indexed same-cluster partner at
    // cosine >= threshold — the pruned probe must match it exactly
    val inBatch = SemDedup.semDedup(batch, "vec_id", "embedding", cents, 0.95)
    val sv = Similarity.withIvfList(inBatch
      .select(col("vec_id").as("sid"), col("embedding").as("svec")),
      "svec", cents, "__c")
    val pv = Similarity.withIvfList(base
      .select(col("vec_id").as("pid"), col("embedding").as("pvec")),
      "pvec", cents, "__c")
    val droppedExpected = sv.join(pv, Seq("__c"))
      .filter(Similarity.cosine(col("svec"), col("pvec")) >= 0.95)
      .select("sid").collect().map(_.getLong(0)).toSet
    val expected = inBatch.select("vec_id").collect().map(_.getLong(0)).toSet
      .diff(droppedExpected)
    assert(survIds == expected)
  }

  test("incremental: replay converges — the same batch re-applied admits and delivers nothing") {
    val idx = freshIdx()
    IvfIndex.build(embAll.filter(col("vec_id") < 300), "vec_id", "embedding",
      idx, nLists = 4)
    val batch = embAll.filter(col("vec_id") >= 300)
    val first = SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding", 0.95)
      .count()
    assert(first > 0)
    val n = IvfIndex.vectors(spark, idx).count()
    var deliveredAgain = -1L
    val replay = SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding",
      0.95, deliver = d => deliveredAgain = d.count())
    assert(replay.isEmpty && deliveredAgain == 0L)
    assert(IvfIndex.vectors(spark, idx).count() == n) // nothing re-appended
  }

  test("incremental: a crash between delivery and append replays into at-least-once, and a PARTIAL append re-admits only the rest") {
    val idx = freshIdx()
    IvfIndex.build(embAll.filter(col("vec_id") < 300), "vec_id", "embedding",
      idx, nLists = 4)
    val batch = embAll.filter(col("vec_id") >= 300)
    // crash in deliver: the append never runs, the index is untouched
    val n0 = IvfIndex.vectors(spark, idx).count()
    intercept[RuntimeException] {
      SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding", 0.95,
        deliver = _ => throw new RuntimeException("sink down"))
    }
    assert(IvfIndex.vectors(spark, idx).count() == n0)
    // partial append (crash mid-append): half the survivors landed; the
    // replay re-admits exactly the other half (in-batch survivors are
    // mutually below threshold, so indexed siblings cannot suppress them)
    val surv = SemDedup.applyBatchIndexed(
      batch, idx, "vec_id", "embedding", 0.95,
      deliver = _ => ()).select("vec_id").collect().map(_.getLong(0)).toSet
    // rebuild the crash state: fresh index + manually append HALF
    val idx2 = freshIdx()
    IvfIndex.build(embAll.filter(col("vec_id") < 300), "vec_id", "embedding",
      idx2, nLists = 4)
    val half = surv.toSeq.sorted.take(surv.size / 2).toSet
    IvfIndex.appendVectors(
      batch.filter(col("vec_id").isin(half.toSeq: _*)),
      "vec_id", "embedding", idx2)
    val readmitted = SemDedup.applyBatchIndexed(
      batch, idx2, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(readmitted == surv.diff(half))
  }

  test("incremental: PQ-leg crash between code and vector appends heals on replay (codes land first)") {
    val idx = freshIdx()
    IvfIndex.build(embAll.filter(col("vec_id") < 300), "vec_id", "embedding",
      idx, nLists = 4)
    IvfIndex.buildPq(spark, idx, m = 16, k = 16)
    val batch = embAll.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    def vecFiles(): Set[java.nio.file.Path] = {
      val root = java.nio.file.Paths.get(idx, "vectors")
      val s = java.nio.file.Files.walk(root)
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet")).toSet
      finally s.close()
    }
    val before = vecFiles()
    val surv = SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv.nonEmpty)
    // simulate the crash AFTER writeCodes, BEFORE writeAssigned: remove
    // exactly the vector files this append created, leaving its codes
    // orphaned — the on-disk state the old vectors-first order turned
    // into a PERMANENT silent ADC hole (replay suppression reads the
    // vectors store, which under that order already held the batch)
    (vecFiles() -- before).foreach(java.nio.file.Files.delete(_))
    val q = embAll.filter(col("vec_id") % 100 === 0)
    def neighbors() = IvfIndex.topKPq(spark, idx, q, "vec_id", "embedding",
        k = 10, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // mid-window the orphan codes are inert: the exact re-rank inner-joins
    // the raw vectors, so a code without a vector can never be emitted
    assert(neighbors().forall { case (_, n) => !surv.contains(n) })
    // replay is NOT suppressed (rule 3 probes the vectors store) — the
    // whole surviving set re-admits, codes collapse, vectors land
    val replay = SemDedup.applyBatchIndexed(batch, idx, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(replay == surv)
    assert(IvfIndex.vectors(spark, idx)
      .filter(col("id").isin(surv.toSeq: _*)).count() == surv.size)
    // duplicate codes from the replay collapse: one row per (query, id)
    val after = neighbors()
    assert(after.distinct.length == after.length)
    assert(after.exists { case (_, n) => surv.contains(n) })
  }

  test("incremental: streaming writer — a later micro-batch's copy of an earlier one drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = freshIdx()
    IvfIndex.build(embAll.filter(col("vec_id") < 200), "vec_id", "embedding",
      idx, nLists = 4)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    // batch 1: fresh docs; batch 2: more fresh docs + a COPY of a
    // batch-1 doc under a new id (must drop against the grown index)
    val b1 = rows(embAll.filter(col("vec_id") >= 200 && col("vec_id") < 300))
    val b2 = rows(embAll.filter(col("vec_id") >= 300)) ++
      Seq((900000001L, b1.head._2))
    val delivered = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val writer = graft.streaming.StreamingSemDedup.writer(
      input.toDF().toDF("vec_id", "embedding"), idx,
      java.nio.file.Files.createTempDirectory("graft-semdd-ckpt").toString,
      "vec_id", "embedding", threshold = 0.95,
      // AvailableNow terminates after draining batch 1; keep the query
      // live so a SECOND addData round flows as its own micro-batch
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("0 seconds")) { d =>
      delivered += d.select("vec_id").collect().map(_.getLong(0)).toSet
    }
    input.addData(b1.toSeq: _*)
    val q = writer.start(); q.processAllAvailable()
    input.addData(b2.toSeq: _*)
    q.processAllAvailable(); q.stop()
    assert(delivered.size == 2)
    assert(delivered(0).contains(b1.head._1))
    assert(!delivered(1).contains(900000001L)) // the cross-batch copy dropped
    assert(delivered(1).nonEmpty)
  }
}
