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

  // ----------------------------------------- executed growth lifecycle

  test("drift-tripped IVF retrain EXECUTES through VersionedStore; apply semantics hold across the cutover") {
    import graft.sim.{IvfIndex, SemDedup}
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-growth-vroot").toString
    val committed = (d: String) => IvfIndex.readMeta(spark, d).isDefined

    // v1: initial build through the cutover
    val base = emb.filter(col("vec_id") < 300)
    val baseN = base.count()
    val v1 = VersionedStore.cutover(spark, root, committed)(
      IvfIndex.build(base, "vec_id", "embedding", _, nLists = 4))
    assert(v1 == VersionedStore.versionDir(root, 1))

    // a batch applies against the serving resolution and grows v1
    val batch1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 350)
    val s1 = SemDedup.applyBatchIndexed(batch1,
      VersionedStore.current(spark, root, committed).get,
      "vec_id", "embedding", 0.95)
    val s1N = s1.count()
    assert(s1N > 0)

    // a crashed retrain: the dir materializes but never commits — v1
    // keeps serving (the VersionedStore crash contract, here exercised
    // through the store's own commit probe)
    intercept[RuntimeException] {
      VersionedStore.cutover(spark, root, committed) { d =>
        new java.io.File(d).mkdirs()
        throw new RuntimeException("crash mid-retrain")
      }
    }
    assert(VersionedStore.current(spark, root, committed).contains(v1))

    // healthy maintenance: no actions, serving unchanged
    val (same, none) = IvfIndex.maintainVersioned(spark, root,
      Policy(targetBucketBytes = 1L << 30, maxFilesPerBucket = 64))
    assert(same == v1 && none.isEmpty)

    // drift-tripped: maintainVersioned retrains into the next version
    // (numbered past the crash remnant) and retires v1 + the remnant
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * 10.0 + 3.0).as("embedding"))
    val (serving, acts) = IvfIndex.maintainVersioned(spark, root,
      Policy(targetBucketBytes = 1L << 30, maxFilesPerBucket = 64,
        maxDriftRatio = 1.5),
      driftBatch = Some((shifted.limit(100), "embedding")))
    assert(acts.exists { case Retrain(r) => r > 1.5; case _ => false })
    assert(serving == VersionedStore.versionDir(root, 3))
    assert(VersionedStore.current(spark, root, committed).contains(serving))
    assert(!new java.io.File(v1).exists(), "retired predecessor must be swept")
    assert(!new java.io.File(VersionedStore.versionDir(root, 2)).exists(),
      "crashed remnant must be swept")

    // the retrained index carries base + the batch-1 survivors
    assert(IvfIndex.vectors(spark, serving).select("id").distinct().count()
      == baseN + s1N)

    // apply semantics hold across the cutover:
    // (a) replaying batch 1 admits nothing — replay suppression carried
    val replay = SemDedup.applyBatchIndexed(batch1, serving,
      "vec_id", "embedding", 0.95)
    assert(replay.isEmpty, "replayed batch must converge after the retrain")
    // (b) planted exact copies of indexed vectors still drop (identical
    // vectors co-locate under ANY quantizer); survivors are fresh-only
    val copies = base.limit(5)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
    val fresh = emb.filter(col("vec_id") >= 350 && col("vec_id") < 360)
      .select((col("vec_id") + 200000000L).as("vec_id"), col("embedding"))
    val s2 = SemDedup.applyBatchIndexed(copies.unionByName(fresh), serving,
      "vec_id", "embedding", 0.95)
    val s2Ids = s2.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s2Ids.nonEmpty && s2Ids.forall(_ >= 200000000L),
      s"planted copies must drop, fresh may survive: $s2Ids")
  }

  test("catalog rebucket EXECUTES through VersionedStore, preserving dedup state across the cutover") {
    import graft.dedup.ExactCatalog
    val root = java.nio.file.Files.createTempDirectory("graft-growth-vcat").toString
    val committed = (d: String) => ExactCatalog.readMeta(spark, d).isDefined
    def docs(r: Range) = r.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")

    // v1 via cutover (the accreting store commits meta-first, so the
    // first append IS the commit)
    val v1 = VersionedStore.cutover(spark, root, committed)(d =>
      ExactCatalog.append(ExactCatalog.entriesOf(docs(0 until 200), "text"),
        d, numBuckets = 2))
    (1 until 4).foreach(b => ExactCatalog.append(
      ExactCatalog.entriesOf(docs(b * 200 until (b + 1) * 200), "text"),
      VersionedStore.current(spark, root, committed).get,
      numBuckets = 2, added = b.toLong))
    val fpCount = ExactCatalog.read(spark, v1)
      .select("fp", "h2").distinct().count()

    // every real catalog exceeds a 1-byte bucket target → Rebucket,
    // EXECUTED into v2 with a doubled count; v1 retired
    val (serving, acts) = ExactCatalog.maintainVersioned(spark, root,
      Policy(targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(acts.exists { case Rebucket(n, _) => n > 2; case _ => false })
    assert(serving == VersionedStore.versionDir(root, 2))
    assert(ExactCatalog.readMeta(spark, serving).exists(_ > 2))
    assert(!new java.io.File(v1).exists(), "retired predecessor must be swept")
    // state preserved: same distinct fingerprint set size
    assert(ExactCatalog.read(spark, serving)
      .select("fp", "h2").distinct().count() == fpCount)

    // dedup behavior preserved: replaying seen docs against the
    // re-sharded serving catalog admits nothing; fresh docs survive.
    // applyBatch derives the NEW bucket count from the catalog's meta —
    // the stale create-time default (2) must not mis-prune.
    val replay = ExactCatalog.applyBatch(
      docs(100 until 300), serving, "doc_id", "text", numBuckets = 2)
    assert(replay.isEmpty)
    val freshBatch = ExactCatalog.applyBatch(
      docs(800 until 820), serving, "doc_id", "text", numBuckets = 2)
    assert(freshBatch.count() == 20)
  }

  test("retrain of a PQ-carrying index: a crash between the raw build and the PQ commit leaves the version uncommitted") {
    import graft.sim.IvfIndex
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-growth-pqcrash")
      .toString
    val strict = (d: String) => IvfIndex.committed(spark, d)

    // v1: IVF + PQ leg, serving-complete under the strict probe
    val v1 = VersionedStore.cutover(spark, root, strict) { d =>
      IvfIndex.build(emb, "vec_id", "embedding", d, nLists = 4)
      IvfIndex.buildPq(spark, d, m = 16, k = 16)
    }
    assert(IvfIndex.committed(spark, v1))

    // retrain's crash window, reproduced exactly: the raw rebuild lands
    // its IVF meta (declaring the PQ leg, as retrain does), then the JVM
    // dies before buildPq commits
    intercept[RuntimeException] {
      VersionedStore.cutover(spark, root, strict) { d =>
        IvfIndex.build(emb, "vec_id", "embedding", d, nLists = 4,
          expectPq = true)
        throw new RuntimeException("crash before buildPq")
      }
    }
    val remnant = VersionedStore.versionDir(root, 2)
    // the raw meta ALONE would have resolved the remnant as serving (the
    // hazard this contract closes); the strict probe keeps v1 serving
    assert(IvfIndex.readMeta(spark, remnant).isDefined)
    assert(!IvfIndex.committed(spark, remnant))
    assert(VersionedStore.current(spark, root, strict).contains(v1))

    // a drift-tripped maintenance retrain completes: the new version
    // carries a committed PQ leg, serves PQ probes, and the remnant +
    // predecessor are swept
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * 10.0 + 3.0).as("embedding"))
    val (serving, acts) = IvfIndex.maintainVersioned(spark, root,
      Policy(targetBucketBytes = 1L << 30, maxFilesPerBucket = 64,
        maxDriftRatio = 1.5),
      driftBatch = Some((shifted.limit(100), "embedding")))
    assert(acts.exists { case Retrain(r) => r > 1.5; case _ => false })
    assert(serving == VersionedStore.versionDir(root, 3))
    assert(IvfIndex.readPqMeta(spark, serving).isDefined &&
      IvfIndex.committed(spark, serving))
    assert(!new java.io.File(remnant).exists(), "remnant must be swept")
    assert(!new java.io.File(v1).exists(), "predecessor must be swept")
    assert(IvfIndex.topKPq(spark, serving, emb.limit(3),
      "vec_id", "embedding", k = 5, nProbe = 2, rerank = 20).count() > 0)
  }
}
