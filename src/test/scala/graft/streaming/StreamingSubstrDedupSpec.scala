package graft.streaming

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.dedup.{ExactCatalog, SubstrCatalog}

/** Catalog-backed streaming SUBSTRING dedup: parity with sequential
  * batch applyBatch, suppressive replay convergence under a new query
  * (the state lives in the catalog, not the engine checkpoint), and
  * rolling retention — the span-level mirror of
  * StreamingExactDedupSpec. */
class StreamingSubstrDedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val W = 4

  private val b1 = Seq(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "unique first crawl content tokens here")
  // doc 10 carries doc 1's windows mid-text; doc 11 is fresh
  private val b2 = Seq(
    10L -> "prefix alpha beta gamma delta epsilon zeta suffix",
    11L -> "totally new second crawl words only")

  private def collectRewrites(
      buf: ArrayBuffer[(Long, Long, Long, String)])(
      df: org.apache.spark.sql.DataFrame): Unit =
    buf ++= df.select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()

  test("streaming rewrites equal sequential batch applyBatch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-ssd").toString

    val r1 = SubstrCatalog.applyBatch(
      b1.toDF("doc_id", "text"), s"$tmp/ref", "doc_id", "text", W, added = 0L)
    val r2 = SubstrCatalog.applyBatch(
      b2.toDF("doc_id", "text"), s"$tmp/ref", "doc_id", "text", W, added = 1L)
    val want = (r1.collect() ++ r2.collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

    val delivered = ArrayBuffer.empty[(Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingSubstrDedup.writer(
        input.toDS().toDF("doc_id", "text"),
        s"$tmp/catalog", s"$tmp/ckpt", "doc_id", "text", W,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))(
        collectRewrites(delivered))
      .start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()

    assert(delivered.toSet == want)
    // the cross-batch span scrubbed, flanks kept; fresh docs untouched
    val byId = delivered.map(r => r._1 -> r).toMap
    assert(byId(10L)._4 == "prefix suffix" && byId(10L)._3 == 6L)
    assert(byId(11L)._3 == 0L)
    // catalog holds 8-byte window fps — never documents
    val cat = ExactCatalog.read(spark, s"$tmp/catalog", SubstrCatalog.kindFor(W))
    assert(cat.columns.toSet == Set("fp", "h2", "added", "bucket"))
  }

  test("a NEW query over the same catalog converges suppressively on replay") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-ssd-resume").toString
    val dir = s"$tmp/catalog"

    val first = ArrayBuffer.empty[(Long, Long, Long, String)]
    val input1 = MemoryStream[(Long, String)]
    val q1 = StreamingSubstrDedup.writer(
        input1.toDS().toDF("doc_id", "text"), dir, s"$tmp/ckpt1",
        "doc_id", "text", W,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))(
        collectRewrites(first)).start()
    input1.addData(b1); q1.processAllAvailable(); q1.stop()
    assert(first.forall(_._3 == 0L)) // first crawl: nothing to scrub

    // a brand-new query (fresh engine checkpoint) replays the same docs:
    // their own windows are catalog members now, so the re-delivery is
    // fully scrubbed (the suppressive-replay contract — downstream keeps
    // the FIRST rewrite per doc id)
    val second = ArrayBuffer.empty[(Long, Long, Long, String)]
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingSubstrDedup.writer(
        input2.toDS().toDF("doc_id", "text"), dir, s"$tmp/ckpt2",
        "doc_id", "text", W,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))(
        collectRewrites(second)).start()
    input2.addData(b1); q2.processAllAvailable()
    assert(second.forall(r => r._3 == r._2 && r._4.isEmpty))
    // and a genuinely fresh doc still flows through clean
    second.clear()
    input2.addData(Seq(99L -> "entirely fresh streaming words arrive"))
    q2.processAllAvailable(); q2.stop()
    assert(second.map(r => (r._1, r._3)) == ArrayBuffer((99L, 0L)))
  }

  test("rolling retention ages out old crawls' windows at the sweep") {
    val tmp = Files.createTempDirectory("graft-ssd-ttl").toString
    val dir = s"$tmp/catalog"
    val _ = StreamingSubstrDedup.applyBatch(
      b1.toDF("doc_id", "text"), dir, "doc_id", "text", W,
      compactAboveFiles = 0, added = 1L)
    // added = 5 on the sweep cadence with window 2: cutoff 3 ages out
    // the added=1 windows catalog-wide
    val _2 = StreamingSubstrDedup.applyBatch(
      Seq(20L -> "retained crawl boiler plate words").toDF("doc_id", "text"),
      dir, "doc_id", "text", W,
      compactAboveFiles = 1, added = 5L, retainAddedBehind = Some(2L),
      retentionSweepEvery = 5L)
    val out = StreamingSubstrDedup.applyBatch(
      Seq(30L -> "alpha beta gamma delta epsilon zeta",
        31L -> "retained crawl boiler plate words").toDF("doc_id", "text"),
      dir, "doc_id", "text", W, compactAboveFiles = 0, added = 6L)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(out(30L) == 0L, "the expired crawl's span must be re-admitted")
    assert(out(31L) > 0L, "the retained crawl's span must still scrub")
  }

  test("versioned root: mid-stream rebucket cutover, window-fp state intact") {
    val root = Files.createTempDirectory("graft-ssd-vroot").toString + "/vroot"
    // trigger 1 bootstraps v1
    val _ = StreamingSubstrDedup.applyBatchVersioned(
      b1.toDF("doc_id", "text"), root, "doc_id", "text", W,
      numBuckets = 4, added = 1L)
    val committed = (d: String) => ExactCatalog.readMeta(spark, d).isDefined
    assert(graft.ops.VersionedStore.current(spark, root, committed)
      .contains(graft.ops.VersionedStore.versionDir(root, 1)))
    // trigger 2 on the maintenance cadence with a tight byte target:
    // Rebucket executes into v2; the batch itself still scrubs against v1
    val out2 = StreamingSubstrDedup.applyBatchVersioned(
      b2.toDF("doc_id", "text"), root, "doc_id", "text", W,
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64))
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(out2(10L) > 0L && out2(11L) == 0L)
    val serving = graft.ops.VersionedStore.current(spark, root, committed).get
    assert(serving == graft.ops.VersionedStore.versionDir(root, 2))
    assert(SubstrCatalog.metaW(spark, serving).contains(W),
      "the rebuilt version must carry the window-width kind")
    // trigger 3 probes v2: spans seen in EITHER prior trigger still
    // scrub — the cutover carried the whole window-fp set
    val out3 = StreamingSubstrDedup.applyBatchVersioned(
      Seq(20L -> "tail alpha beta gamma delta epsilon zeta more",
        21L -> "brand new third crawl material entirely").toDF("doc_id", "text"),
      root, "doc_id", "text", W, added = 3L)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(out3(20L) > 0L && out3(21L) == 0L)
  }
}
