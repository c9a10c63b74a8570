package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.ImageFixtures

class ImageCatalogSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-imgcat-spec").toString

  private def imgs(ids: Seq[Long], seedOf: Long => Long,
      variantOf: Long => Int = _ => 0): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, ImageFixtures.syntheticPng(seedOf(i), variantOf(i))))
      .toDF("id", "img")
  }

  test("exact tier: catalog suppresses byte-identical images across batches, admits fresh") {
    val dir = tmpDir() + "/exact"
    ImageCatalog.appendExact(
      ImageCatalog.exactEntriesOf(imgs(0L until 20L, identity), "img"), dir)
    var delivered: Set[Long] = null
    // batch: 10 copies of catalog images (same seeds) + 10 fresh
    val batch = imgs(100L until 110L, _ - 100L) // copies of seeds 0..9
      .unionByName(imgs(200L until 210L, identity)) // fresh seeds 200..209
    val out = ImageCatalog.applyBatchExact(batch, dir, "id", "img",
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == (200L until 210L).toSet)
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay converges: everything now suppressed
    val replay = ImageCatalog.applyBatchExact(batch, dir, "id", "img")
    assert(replay.count() == 0)
  }

  test("phash tier: perceptual near-dups drop cross-batch AND in-batch, fresh kept, replay suppressive") {
    val dir = tmpDir() + "/phash"
    // prior corpus: seeds 0..19
    val prior = ImageDedup.withPHash(imgs(0L until 20L, identity), "img")
      .select(col("id"), col("phash"))
    ImageCatalog.appendPhash(ImageCatalog.phashEntriesOf(prior), dir)
    // batch: near-dup variants of seeds 0..4 (cross-batch drops), a
    // fresh pair sharing seed 500 where one is the upscaled variant
    // (in-batch collapse to min id), and fresh seeds 600..604
    val batch =
      imgs(300L until 305L, _ - 300L, _ => 1)
        .unionByName(imgs(Seq(400L), _ => 500L))
        .unionByName(imgs(Seq(401L), _ => 500L, _ => 1))
        .unionByName(imgs(600L until 605L, identity))
    var delivered: Set[Long] = null
    val out = ImageCatalog.applyBatchPhash(batch, dir, "id", "img",
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(400L) ++ (600L until 605L).toSet)
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay: the survivors' hashes are now catalog members
    val replay = ImageCatalog.applyBatchPhash(batch, dir, "id", "img")
    assert(replay.count() == 0)
  }

  test("undecodable payloads pass the phash tier untouched") {
    import spark.implicits._
    val dir = tmpDir() + "/phash-junk"
    val batch = imgs(0L until 3L, identity)
      .unionByName(Seq((9L, "junk".getBytes)).toDF("id", "img"))
    val out = ImageCatalog.applyBatchPhash(batch, dir, "id", "img")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L, 9L))
    // and they never enter the catalog: replaying only the junk row
    // passes it again (membership is of decodable hashes)
    val again = ImageCatalog.applyBatchPhash(
      Seq((10L, "junk".getBytes)).toDF("id", "img"), dir, "id", "img")
    assert(again.count() == 1)
  }

  test("composed applyBatch: exact drops before any decode, phash drops the rest") {
    val root = tmpDir()
    // prior: seeds 0..9 in both catalogs via the composed operator
    val _ = ImageCatalog.applyBatch(
      imgs(0L until 10L, identity), s"$root/e", s"$root/p", "id", "img")
    // batch: byte-copy of seed 3, near-dup of seed 4, fresh seed 700
    val batch = imgs(Seq(801L), _ => 3L)
      .unionByName(imgs(Seq(802L), _ => 4L, _ => 1))
      .unionByName(imgs(Seq(803L), _ => 700L))
    var delivered: Set[Long] = null
    val out = ImageCatalog.applyBatch(batch, s"$root/e", s"$root/p", "id", "img",
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(803L))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(803L))
  }

  test("kind universe guard: an image catalog refuses text/window readers and vice versa") {
    val dir = tmpDir() + "/kinds"
    ImageCatalog.appendExact(
      ImageCatalog.exactEntriesOf(imgs(0L until 3L, identity), "img"), dir)
    // a text-exact reader must refuse an image catalog
    val e1 = intercept[IllegalArgumentException] {
      ExactCatalog.read(spark, dir)
    }
    assert(e1.getMessage.contains("image_exact"))
    // and an image-phash reader must refuse an image-exact catalog
    val e2 = intercept[IllegalArgumentException] {
      ExactCatalog.readForBatch(spark, dir,
        spark.range(1).select(col("id").as("fp")), kind = ImageCatalog.KindPhash)
    }
    assert(e2.getMessage.contains("image_exact"))
  }

  test("lifecycle delegation: compaction collapses replayed appends, rebucket carries the kind") {
    val dir = tmpDir() + "/life"
    val entries = ImageCatalog.exactEntriesOf(imgs(0L until 5L, identity), "img")
    ImageCatalog.appendExact(entries, dir, added = 1L)
    ImageCatalog.appendExact(entries, dir, added = 2L) // replayed append
    ImageCatalog.compact(spark, dir)
    assert(ExactCatalog.read(spark, dir, kind = ImageCatalog.KindExact)
      .count() == 5) // duplicates collapsed
    val to = tmpDir() + "/life2"
    ImageCatalog.rebucket(spark, dir, to, newBuckets = 8)
    assert(ExactCatalog.readMetaKind(spark, to).contains(ImageCatalog.KindExact))
    assert(ExactCatalog.read(spark, to, kind = ImageCatalog.KindExact).count() == 5)
  }

  test("versioned pair root: tripped maintenance cuts the stream over mid-flight, state intact") {
    val root = tmpDir() + "/vroot"
    // trigger 1 bootstraps v1 (both tiers) from an empty root
    val s1 = graft.streaming.StreamingImageDedup.applyBatchVersioned(
      imgs(0L until 6L, identity), root, "id", "img",
      numBuckets = 4, added = 1L)
    assert(s1.count() == 6)
    assert(graft.ops.VersionedStore.current(spark, root,
      d => ImageCatalog.isCommittedPair(spark, d))
      .contains(graft.ops.VersionedStore.versionDir(root, 1)))
    // trigger 2 lands on the maintenance cadence with a tight byte
    // target: Rebucket trips and EXECUTES both tiers into v2 mid-stream
    val s2 = graft.streaming.StreamingImageDedup.applyBatchVersioned(
      imgs(100L until 103L, _ - 100L), root, "id", "img",
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(s2.count() == 0, "copies of v1 survivors must drop before the cutover")
    val serving = graft.ops.VersionedStore.current(spark, root,
      d => ImageCatalog.isCommittedPair(spark, d)).get
    assert(serving == graft.ops.VersionedStore.versionDir(root, 2))
    assert(!new java.io.File(graft.ops.VersionedStore.versionDir(root, 1))
      .exists(), "retired predecessor must be swept")
    // trigger 3 probes the NEW pair with default args: perceptual
    // near-dups of v1 survivors drop too — both tiers carried over
    assert(graft.streaming.StreamingImageDedup.applyBatchVersioned(
      imgs(200L until 203L, _ - 197L, _ => 1), root, "id", "img",
      added = 3L).count() == 0)
  }

  test("streaming wrapper: hygiene compacts per bucket, state persists across batches") {
    val root = tmpDir()
    val b1 = imgs(0L until 8L, identity)
    val _ = graft.streaming.StreamingImageDedup.applyBatch(
      b1, s"$root/e", s"$root/p", "id", "img", compactAboveFiles = 1, added = 1L)
    // second batch: 4 byte-copies + 4 near-dups of batch-1 images + 2 fresh
    val b2 = imgs(100L until 104L, _ - 100L)
      .unionByName(imgs(110L until 114L, _ - 106L, _ => 1))
      .unionByName(imgs(900L until 902L, identity))
    val out2 = graft.streaming.StreamingImageDedup.applyBatch(
      b2, s"$root/e", s"$root/p", "id", "img", compactAboveFiles = 1, added = 2L)
    assert(out2.select("id").collect().map(_.getLong(0)).toSet ==
      Set(900L, 901L))
  }
}
