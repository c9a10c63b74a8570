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
}
