package graft.streaming

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.dedup.ExactCatalog

/** Catalog-backed streaming EXACT dedup: parity with sequential batch
  * applyBatch, replay convergence, restart-from-new-query resume (the
  * state lives in the catalog, not the engine checkpoint), and rolling
  * retention — the exact-tier mirror of StreamingNearDedupSpec. */
class StreamingExactDedupSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(): (Seq[(Long, String)], Seq[(Long, String)]) = {
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(120).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b1 = base.take(100).toSeq
    // batch 2: 10 EXACT copies of batch-1 docs under shifted ids
    // (cross-batch drops) + 20 fresh
    val b2 = (base.take(10).map { case (id, t) => (id + 100000L, t) } ++
      base.slice(100, 120)).toSeq
    (b1, b2)
  }

  test("streaming survivors equal sequential batch applyBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2) = corpus()
    val tmp = Files.createTempDirectory("graft-sed").toString

    // reference: sequential batch applyBatch into a separate catalog
    val s1 = ExactCatalog.applyBatch(
      b1.toDF("doc_id", "text"), s"$tmp/ref", "doc_id", "text", added = 0L)
    val s2 = ExactCatalog.applyBatch(
      b2.toDF("doc_id", "text"), s"$tmp/ref", "doc_id", "text", added = 1L)
    val want = (s1.collect() ++ s2.collect())
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val delivered = ArrayBuffer.empty[(Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingExactDedup.writer(
        input.toDS().toDF("doc_id", "text"),
        s"$tmp/catalog", s"$tmp/ckpt", "doc_id", "text",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) {
        surv => delivered ++= surv.collect()
          .map(r => (r.getLong(0), r.getString(1)))
      }
      .start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()

    assert(delivered.toSet == want)
    // cross-batch exact copies dropped; fresh batch-2 docs survived
    assert(!delivered.exists(_._1 >= 100000L))
    val freshIds = b2.collect { case (id, _) if id < 100000L => id }.toSet
    assert(delivered.exists(p => freshIds.contains(p._1)))
    // catalog holds 16-byte entries per distinct text — never documents
    val cat = ExactCatalog.read(spark, s"$tmp/catalog")
    assert(cat.columns.toSet == Set("fp", "h2", "added", "bucket"))
    assert(cat.count() == want.map(_._2).size)
  }

  test("a NEW query over the same catalog resumes the dedup state (replay converges)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (b1, _) = corpus()
    val tmp = Files.createTempDirectory("graft-sed-resume").toString
    val dir = s"$tmp/catalog"

    val first = ArrayBuffer.empty[Long]
    val input1 = MemoryStream[(Long, String)]
    val q1 = StreamingExactDedup.writer(
        input1.toDS().toDF("doc_id", "text"), dir, s"$tmp/ckpt1",
        "doc_id", "text",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) {
        surv => first ++= surv.collect().map(_.getLong(0))
      }.start()
    input1.addData(b1); q1.processAllAvailable(); q1.stop()
    assert(first.size == b1.map(_._2).distinct.size)

    // a brand-new query (fresh engine checkpoint) REPLAYS the same docs:
    // the catalog — not the checkpoint — carries the state, so nothing
    // is re-delivered
    val second = ArrayBuffer.empty[Long]
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingExactDedup.writer(
        input2.toDS().toDF("doc_id", "text"), dir, s"$tmp/ckpt2",
        "doc_id", "text",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) {
        surv => second ++= surv.collect().map(_.getLong(0))
      }.start()
    input2.addData(b1); q2.processAllAvailable()
    // and genuinely new docs still flow
    input2.addData(Seq((777777L, "a genuinely fresh exact-dedup doc")))
    q2.processAllAvailable(); q2.stop()
    assert(second.toSeq == Seq(777777L))
  }

  test("rolling retention ages out old crawls at auto-compaction") {
    import spark.implicits._
    val (b1, _) = corpus()
    val old = b1.take(10)
    val fresh = b1.slice(50, 60)
    val tmp = Files.createTempDirectory("graft-sed-ttl").toString
    val dir = s"$tmp/catalog"
    StreamingExactDedup.applyBatch(
      old.toDF("doc_id", "text"), dir, "doc_id", "text",
      compactAboveFiles = 0, added = 1L)
    // batch at added = 5, window 2, on the sweep cadence (5 % 5 == 0):
    // the FULL sweep applies cutoff 3 catalog-wide, aging out added=1
    StreamingExactDedup.applyBatch(
      fresh.toDF("doc_id", "text"), dir, "doc_id", "text",
      compactAboveFiles = 1, added = 5L, retainAddedBehind = Some(2L),
      retentionSweepEvery = 5L)
    val readmitted = StreamingExactDedup.applyBatch(
      (old.map { case (id, t) => (id + 300000L, t) } ++
        fresh.map { case (id, t) => (id + 400000L, t) })
        .toDF("doc_id", "text"),
      dir, "doc_id", "text", compactAboveFiles = 0, added = 6L)
      .collect().map(_.getLong(0)).toSet
    assert(old.forall { case (id, _) => readmitted.contains(id + 300000L) },
      "copies of the expired crawl must be admitted")
    assert(fresh.forall { case (id, _) => !readmitted.contains(id + 400000L) },
      "copies of the retained crawl must still drop")
  }
}
