package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.cdc.{CdcApply, Changelog}
import graft.pipe.ParquetStateSink

/** DSv2 micro-batch CDC source: bounded peeks (admission control =
  * peek_changes_limit), offset progression, and end-state equivalence
  * with the batch pipeline. */
class CdcSourceSpec extends AnyFunSuite with SparkTestBase {

  test("readStream over the changelog: bounded batches, state converges") {
    val tmp = Files.createTempDirectory("graft-dsv2").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val changelog = Changelog.fromEvents(events)
    changelog.write.mode("overwrite").parquet(s"$tmp/changelog")

    val stream = spark.readStream
      .format(classOf[CdcSourceProvider].getName)
      .option("path", s"$tmp/changelog")
      .option("seqCol", "seq")
      .option("maxEventsPerTrigger", 250)
      .load()
    assert(stream.isStreaming)

    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))(spark)
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = stream.writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
        val n = batch.count()
        if (n > 0) { batchSizes += n; sink.appendBatch(batch, epochId + 1) }
      }
      .start()
    q.awaitTermination()

    // peek limit respected and actually sliced the 1000-event log
    assert(batchSizes.forall(_ <= 250), s"batch sizes: $batchSizes")
    assert(batchSizes.length >= 4, s"expected >=4 micro-batches: $batchSizes")
    assert(batchSizes.sum == 1000)

    // end state == the batch pipeline applying the same changelog with the
    // same batch windows (streaming batches are consecutive seq windows)
    val got = sink.read().orderBy("user_id").collect().toSeq
    val want = CdcApply.runLoop(changelog, Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"), batchSize = 250)
      .orderBy("user_id").collect().toSeq
    // runLoop windows are seq-range based while the stream slices by count;
    // both respect WAL order, so compare against the declarative form with
    // matching boundaries instead: batch id = position/250 in seq order.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("seq"))
    val withBatch = changelog
      .withColumn("__pos", row_number().over(w) - 1)
    val wantCount = CdcApply.finalState(withBatch, Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"), floor(col("__pos") / 250))
      .orderBy("user_id").collect().toSeq
    assert(got == wantCount)
    assert(want.nonEmpty) // runLoop sanity (not the primary oracle here)
  }
}
