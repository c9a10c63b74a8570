package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.GrowthPolicy.{Compact, Policy, Rebucket, Retrain}

/** The growth policy trips EXACTLY at its documented thresholds — never
  * before — and the per-store maintain wrappers feed it real signals and
  * auto-run only the in-place-safe action (compaction). */
class GrowthPolicySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------- pure policy

  test("rebucket trips strictly above the mean-bucket-size target, doubling until it fits") {
    val p = Policy(targetBucketBytes = 100L, maxFilesPerBucket = 8)
    def bytes(total: Long) = Map(0 -> total) // skew is irrelevant: mean over CONFIGURED buckets
    // mean == target: healthy (4 buckets × 100 B)
    assert(GrowthPolicy.recommend(4, bytes(400), Map.empty, p).isEmpty)
    // one byte over: trips, one doubling suffices
    assert(GrowthPolicy.recommend(4, bytes(401), Map.empty, p) ==
      Seq(Rebucket(8, 100L)))
    // 1700 B over 4 buckets: 8→800 and 16→1600 still too small, 32 fits
    assert(GrowthPolicy.recommend(4, bytes(1700), Map.empty, p) ==
      Seq(Rebucket(32, 425L)))
    // petabyte-scale totals must terminate, not wrap an Int doubling
    // loop negative: a small target against a huge store caps the
    // recommendation at Int.MaxValue bucket ids
    val huge = GrowthPolicy.recommend(4, bytes(Long.MaxValue / 4),
      Map.empty, Policy(targetBucketBytes = 1024L, maxFilesPerBucket = 8))
    assert(huge == Seq(Rebucket(Int.MaxValue, Long.MaxValue / 16)))
  }

  test("compact trips strictly above the per-bucket file cap, only for the offenders") {
    val p = Policy(targetBucketBytes = Long.MaxValue >> 8, maxFilesPerBucket = 3)
    // at the cap: healthy
    assert(GrowthPolicy.recommend(4, Map.empty, Map(0 -> 3, 1 -> 3), p).isEmpty)
    // one file over, in two buckets out of three: exactly those, sorted
    assert(GrowthPolicy.recommend(4, Map.empty,
      Map(2 -> 4, 0 -> 9, 1 -> 3), p) == Seq(Compact(Seq(0, 2))))
  }

  test("retrain trips strictly above the drift ratio; actions co-trip in documented order") {
    val p = Policy(targetBucketBytes = 100L, maxFilesPerBucket = 3,
      maxDriftRatio = 1.5)
    assert(GrowthPolicy.recommend(1, Map.empty, Map.empty, p,
      driftRatio = Some(1.5)).isEmpty)
    assert(GrowthPolicy.recommend(1, Map.empty, Map.empty, p,
      driftRatio = Some(1.5001)) == Seq(Retrain(1.5001)))
    // all three at once: Rebucket leads (a re-shard collapses the
    // fragmentation, making the compact moot if acted on first)
    assert(GrowthPolicy.recommend(1, Map(0 -> 101L), Map(0 -> 4), p,
      driftRatio = Some(2.0)) ==
      Seq(Rebucket(2, 101L), Compact(Seq(0)), Retrain(2.0)))
  }

  test("edge guards: degenerate thresholds refuse; an empty drift batch never trips") {
    // a zero target would spin the doubling loop until overflow
    assertThrows[IllegalArgumentException] {
      GrowthPolicy.recommend(1, Map.empty, Map.empty,
        Policy(targetBucketBytes = 0L))
    }
    assertThrows[IllegalArgumentException] {
      GrowthPolicy.recommend(1, Map.empty, Map.empty,
        Policy(maxFilesPerBucket = 0))
    }
    // NaN (no evidence) must not satisfy the strict > comparison
    assert(GrowthPolicy.recommend(1, Map.empty, Map.empty, Policy(),
      driftRatio = Some(Double.NaN)).isEmpty)
    // an EMPTY batch's drift estimate is NaN, not an NPE
    import graft.sim.IvfIndex
    val emb = graft.sources.Tables.read(
      spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-growth-nan")
      .toString + "/idx"
    IvfIndex.build(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
      dir, nLists = 2)
    val r = IvfIndex.driftRatio(spark, dir, emb.limit(0), "embedding")
    assert(r.exists(_.isNaN))
    assert(IvfIndex.maintain(spark, dir,
      driftBatch = Some((emb.limit(0), "embedding"))).isEmpty)
  }

  // ------------------------------------------------- store integration

  test("exact catalog maintain: real signals, auto-compact runs, rebucket only recommended") {
    import graft.dedup.ExactCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft-growth-ex").toString
    def docs(r: Range) = r.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    // 4 small appends → up to 4 files in some bucket
    (0 until 4).foreach { b =>
      ExactCatalog.append(
        ExactCatalog.entriesOf(docs(b * 100 until (b + 1) * 100), "text"),
        dir, numBuckets = 2, added = b.toLong)
    }
    // tiny byte target: every real catalog exceeds it → Rebucket
    // recommended with a doubled count, but NOT executed (dir unchanged)
    val tight = Policy(targetBucketBytes = 1L, maxFilesPerBucket = 1)
    val acts = ExactCatalog.maintain(spark, dir, tight, autoCompact = true)
    assert(acts.exists { case Rebucket(n, _) => n > 2; case _ => false })
    assert(ExactCatalog.readMeta(spark, dir).contains(2)) // no in-place re-shard
    // the compaction DID run: every bucket is back to one file
    assert(ExactCatalog.bucketFileCounts(spark, dir).forall(_._2 == 1))
    // state preserved through the auto-compact
    assert(ExactCatalog.read(spark, dir).count() == 400)

    // healthy store under a generous policy: no actions
    assert(ExactCatalog.maintain(spark, dir,
      Policy(targetBucketBytes = 1L << 30, maxFilesPerBucket = 8)).isEmpty)
  }

  test("IVF maintain: drift ratio ≈1 on in-distribution data, trips on shifted vectors") {
    import graft.sim.IvfIndex
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-growth-ivf")
      .toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", dir, nLists = 4)

    // in-distribution batch: quantization error ~ the build reference
    val same = IvfIndex.driftRatio(spark, dir, emb.limit(100), "embedding").get
    assert(same > 0.5 && same < 1.5, s"in-distribution drift ratio $same")

    // shifted/scaled vectors: the trained quantizer no longer fits
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * 10.0 + 3.0).as("embedding"))
    val far = IvfIndex.driftRatio(spark, dir, shifted.limit(100), "embedding").get
    assert(far > 1.5, s"shifted drift ratio $far")

    val acts = IvfIndex.maintain(spark, dir,
      Policy(targetBucketBytes = 1L << 30, maxFilesPerBucket = 8,
        maxDriftRatio = 1.5),
      driftBatch = Some((shifted.limit(100), "embedding")))
    assert(acts == Seq(Retrain(far)) ||
      acts.exists { case Retrain(r) => r > 1.5; case _ => false })
  }
}
