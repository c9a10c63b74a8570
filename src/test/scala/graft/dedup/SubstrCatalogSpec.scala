package graft.dedup

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The persistent window-fingerprint catalog ([[SubstrCatalog]]):
  * parity with the in-memory incremental path, catalog advance across
  * batches, novel-only appends, deliver-before-append crash ordering,
  * meta-derived layout, and the empty-catalog bootstrap. Layout
  * mechanics (pruned reads, compaction, rebucket, orphan-data refusal)
  * are delegated verbatim to [[ExactCatalog]] and pinned there +
  * ScaleSpec. */
class SubstrCatalogSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val W = 4

  private def tmpDir(): String =
    Files.createTempDirectory("graft-substr-cat").toString

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  private val prior = docs(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "license header alpha beta gamma delta end")

  private val batch = docs(
    10L -> "intro text then the quick brown fox jumps away",
    11L -> "completely novel content with no duplication at all here",
    12L -> "shared boiler plate phrase four five six",
    13L -> "prefix words shared boiler plate phrase four five six suffix")

  test("applyBatch matches the in-memory incremental path") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    val viaCatalog = SubstrCatalog.applyBatch(
      batch, dir, "doc_id", "text", W, added = 1L)
    val flat = SubstrDedup.dedupSubstringsIncremental(
      batch, SubstrDedup.windowFpSet(prior, "text", W), "doc_id", "text", W)
    assert(rowsOf(viaCatalog) == rowsOf(flat))
    // and the hand-corpus shape is what the operator promises: doc 10
    // loses the prior-corpus span, 11 is untouched, 13 loses the span
    // doc 12 (lower id) owns in-batch
    val byId = rowsOf(viaCatalog).map(r => r._1 -> r).toMap
    assert(byId(10L)._3 > 0 && byId(10L)._4.startsWith("intro text then"))
    assert(byId(11L)._3 == 0L)
    assert(byId(12L)._3 == 0L)
    assert(byId(13L)._3 > 0 && !byId(13L)._4.contains("boiler"))
  }

  test("catalog advances: a later batch is deduped against an earlier one") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    val _ = SubstrCatalog.applyBatch(batch, dir, "doc_id", "text", W, added = 1L)
    val batch2 = docs(
      20L -> "completely novel content with no duplication again maybe",
      21L -> "fresh second crawl words only nothing repeated")
    val out2 = rowsOf(SubstrCatalog.applyBatch(
      batch2, dir, "doc_id", "text", W, added = 2L))
    val byId = out2.map(r => r._1 -> r).toMap
    // doc 20 repeats doc 11's "completely novel content with no
    // duplication" windows — now catalog members
    assert(byId(20L)._3 > 0 && !byId(20L)._4.contains("novel"))
    assert(byId(21L)._3 == 0L)
  }

  test("appends are novel-only: overlapping batches never grow duplicate rows") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    val _ = SubstrCatalog.applyBatch(batch, dir, "doc_id", "text", W, added = 1L)
    val distinctUnion = SubstrDedup
      .windowFpSet(prior.union(batch), "text", W).count()
    assert(ExactCatalog.read(spark, dir, SubstrCatalog.kindFor(W)).count() == distinctUnion)
    // replay whose append already landed: delivery is SUPPRESSIVE (the
    // batch's own windows are catalog members — every ≥W-token doc is
    // fully scrubbed), and the catalog still gains nothing
    val replay = rowsOf(SubstrCatalog.applyBatch(
      batch, dir, "doc_id", "text", W, added = 2L))
    assert(replay.forall(r => r._3 == r._2 && r._4.isEmpty))
    assert(ExactCatalog.read(spark, dir, SubstrCatalog.kindFor(W)).count() == distinctUnion)
  }

  test("crash ordering: a failed delivery leaves the catalog unadvanced") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    val before = ExactCatalog.read(spark, dir, SubstrCatalog.kindFor(W)).count()
    val boom = intercept[RuntimeException] {
      SubstrCatalog.applyBatch(batch, dir, "doc_id", "text", W, added = 1L,
        deliver = _ => throw new RuntimeException("downstream down"))
    }
    assert(boom.getMessage == "downstream down")
    assert(ExactCatalog.read(spark, dir, SubstrCatalog.kindFor(W)).count() == before)
    // the replay after the crash delivers the full, correct rewrite
    val replay = SubstrCatalog.applyBatch(
      batch, dir, "doc_id", "text", W, added = 1L)
    assert(rowsOf(replay) == rowsOf(SubstrDedup.dedupSubstringsIncremental(
      batch, SubstrDedup.windowFpSet(prior, "text", W), "doc_id", "text", W)))
  }

  test("layout is meta-derived: appends follow the created bucket count") {
    val dir = tmpDir()
    SubstrCatalog.append(
      SubstrCatalog.entriesOf(prior, "text", W), dir, W, numBuckets = 4)
    // a later caller passing the DEFAULT bucket count must not fracture
    // the layout — meta wins
    val _ = SubstrCatalog.applyBatch(batch, dir, "doc_id", "text", W, added = 1L)
    assert(ExactCatalog.readMeta(spark, dir).contains(4))
    val buckets = Option(new java.io.File(dir).listFiles).get
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(buckets.forall(b => b.stripPrefix("bucket=").toInt < 4))
    // and the advanced catalog still prunes/joins correctly
    val out2 = rowsOf(SubstrCatalog.applyBatch(
      docs(30L -> "the quick brown fox jumps high"), dir,
      "doc_id", "text", W, added = 2L))
    assert(out2.head._3 > 0)
  }

  test("w is a layout property: a wrong-w caller probes with the catalog's own width") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    assert(SubstrCatalog.metaW(spark, dir).contains(W))
    // a caller passing w = W + 3 would fingerprint disjoint windows and
    // scrub nothing — the meta-derived width must win (same contract as
    // numBuckets) and the prior-corpus span still scrubs
    val out = rowsOf(SubstrCatalog.applyBatch(
      docs(50L -> "intro the quick brown fox jumps outro"), dir,
      "doc_id", "text", w = W + 3, added = 1L))
    assert(out.head._3 > 0 && !out.head._4.contains("quick"))
  }

  test("kind-marked meta: the two fingerprint universes refuse each other's dirs") {
    val dir = tmpDir()
    SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), dir, W)
    // a document-dedup reader/appender on a window-fp catalog
    val e1 = intercept[IllegalArgumentException] {
      ExactCatalog.read(spark, dir).count()
    }
    assert(e1.getMessage.contains("fingerprint universes"))
    val _ = intercept[IllegalArgumentException] {
      ExactCatalog.applyBatch(prior, dir, "doc_id", "text")
    }
    // and the reverse: a window-fp reader on a document catalog
    val exactDir = tmpDir()
    ExactCatalog.append(ExactCatalog.entriesOf(prior, "text"), exactDir)
    val _2 = intercept[IllegalArgumentException] {
      SubstrCatalog.applyBatch(batch, exactDir, "doc_id", "text", W)
    }
    // rebucket carries the kind over — the new version still refuses
    val dir2 = tmpDir() + "/v2"
    SubstrCatalog.rebucket(spark, dir, dir2, newBuckets = 8)
    assert(ExactCatalog.readMetaKind(spark, dir2).contains(SubstrCatalog.kindFor(W)))
    val _3 = intercept[IllegalArgumentException] {
      ExactCatalog.read(spark, dir2).count()
    }
  }

  test("versioned lifecycle: a tripped rebucket serves the new version, kind intact") {
    import graft.ops.{GrowthPolicy, VersionedStore}
    val root = Files.createTempDirectory("graft-substr-vroot").toString
    val committed = (d: String) => ExactCatalog.readMeta(spark, d).isDefined
    val v1 = VersionedStore.cutover(spark, root, committed)(
      SubstrCatalog.append(SubstrCatalog.entriesOf(prior, "text", W), _, W,
        numBuckets = 2))
    val fpCount = SubstrCatalog.readFps(spark, v1).count()

    // byte-size policy trips Rebucket; maintainVersioned executes it
    // into v2, retires v1, and the kind tag must carry over
    val (serving, acts) = SubstrCatalog.maintainVersioned(spark, root,
      GrowthPolicy.Policy(targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(acts.exists {
      case GrowthPolicy.Rebucket(n, _) => n > 2; case _ => false })
    assert(serving == VersionedStore.versionDir(root, 2))
    assert(!new java.io.File(v1).exists(), "retired predecessor must be swept")
    assert(ExactCatalog.readMetaKind(spark, serving).contains(SubstrCatalog.kindFor(W)))
    assert(SubstrCatalog.readFps(spark, serving).distinct().count() == fpCount)
    // scrubbing still works against the re-sharded serving version, with
    // the stale create-time bucket count ignored in favor of the meta
    val out = rowsOf(SubstrCatalog.applyBatch(
      docs(40L -> "the quick brown fox jumps far away tonight"), serving,
      "doc_id", "text", W, numBuckets = 2, added = 9L))
    assert(out.head._3 > 0)
  }

  test("empty catalog bootstrap: first batch equals the one-shot dedup") {
    val dir = tmpDir()
    val viaCatalog = SubstrCatalog.applyBatch(
      batch, dir, "doc_id", "text", W, added = 0L)
    assert(rowsOf(viaCatalog) ==
      rowsOf(SubstrDedup.dedupSubstrings(batch, "doc_id", "text", W)))
    assert(ExactCatalog.read(spark, dir, SubstrCatalog.kindFor(W)).count() ==
      SubstrDedup.windowFpSet(batch, "text", W).count())
  }
}
