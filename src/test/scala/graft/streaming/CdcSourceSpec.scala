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

  test("a growing log is picked up: files appended after stream start sync") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dsv2-grow").toString
    def chunk(lo: Long, hi: Long) =
      (lo to hi).map(s => (s, "I", s % 7, s * 1.0)).toDF("seq", "op", "user_id", "value")
    chunk(1, 100).write.mode("append").parquet(s"$tmp/log")

    val stream = spark.readStream
      .format(classOf[CdcSourceProvider].getName)
      .option("path", s"$tmp/log")
      .option("seqCol", "seq")
      .option("maxEventsPerTrigger", 40)
      .load()
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = stream.writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= batch.select("seq").collect().map(_.getLong(0))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.toSet == (1L to 100L).toSet)
      // the stream is caught up; append NEW files — the index must
      // refresh (a build-once index would freeze at the startup snapshot).
      // Pickup is asynchronous (throttled re-listing inside latestOffset),
      // so poll for the eventual state.
      chunk(101, 180).write.mode("append").parquet(s"$tmp/log")
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (seen.size < 180 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        if (seen.size < 180) Thread.sleep(200)
      }
      assert(seen.toSet == (1L to 180L).toSet,
        s"post-start appends invisible: max=${seen.max}")
    } finally q.stop()
  }

  test("driver holds only the seq index; batch windows prune to intersecting files") {
    val tmp = Files.createTempDirectory("graft-dsv2-idx").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val changelog = Changelog.fromEvents(events)
    // 4 files with disjoint seq ranges (range partition + sort)
    changelog.repartitionByRange(4, col("seq")).sortWithinPartitions("seq")
      .write.mode("overwrite").parquet(s"$tmp/changelog")

    val schema = spark.read.parquet(s"$tmp/changelog").schema
    val index = new CdcLogIndex(schema, Map("path" -> s"$tmp/changelog"))

    // the index is per-file (count, min, max) triples — O(files), not
    // O(events): no row data and no seq array live on the driver (the
    // seqs member no longer exists; the test-side reference below is
    // the spec's own collect, not the index's)
    assert(index.totalCount == 1000L)
    import spark.implicits._
    val seqsRef = changelog.select(col("seq").cast("long")).as[Long]
      .collect().sorted

    // full window → all 4 files; a window inside one file's range → 1 file
    val all = index.partitionsFor(Long.MinValue, Long.MaxValue)
    assert(all.length == 4)
    val lo = seqsRef(100); val hi = seqsRef(120)
    val narrow = index.partitionsFor(lo, hi)
    assert(narrow.length < all.length, s"expected file pruning, got ${narrow.length}")

    // endOfWindow: exact maxRows admission over the metadata index
    assert(index.endOfWindow(Long.MinValue, 250, None).contains(seqsRef(249)))
    assert(index.endOfWindow(seqsRef.last, 250, None).isEmpty) // caught up
    // availableNow cap bounds the window
    assert(index.endOfWindow(Long.MinValue, 250, Some(seqsRef(9))).contains(seqsRef(9)))
    // boundary-file exactness: a `from` strictly inside one file's range
    // forces the in-file offset scan — the window end is still the exact
    // budget-th seq after it
    assert(index.endOfWindow(seqsRef(100), 50, None).contains(seqsRef(150)))
    // a budget covering the remainder returns the high-watermark with no
    // sort job
    assert(index.endOfWindow(seqsRef(100), 10000, None).contains(seqsRef.last))
    assert(index.maxSeqOption.contains(seqsRef.last))
  }

  test("admission stays exact across OVERLAPPING file ranges (interleaved log segments)") {
    val tmp = Files.createTempDirectory("graft-dsv2-ovl").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val changelog = Changelog.fromEvents(events)
    // two files whose seq ranges fully interleave: even seqs and odd
    // seqs — the minSeq-prefix alone would under-collect without the
    // overlap closure
    changelog.filter(col("seq") % 2 === 0).coalesce(1)
      .write.parquet(s"$tmp/log/even")
    changelog.filter(col("seq") % 2 === 1).coalesce(1)
      .write.parquet(s"$tmp/log/odd")
    val schema = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$tmp/log").schema
    val index = new CdcLogIndex(schema, Map("path" -> s"$tmp/log"))
    import spark.implicits._
    val seqsRef = changelog.select(col("seq").cast("long")).as[Long]
      .collect().sorted
    assert(index.totalCount == 1000L)
    for (k <- Seq(1, 7, 250, 999))
      assert(index.endOfWindow(Long.MinValue, k, None).contains(seqsRef(k - 1)),
        s"k=$k")
    assert(index.endOfWindow(seqsRef(499), 3, None).contains(seqsRef(502)))
  }

  test("file index survives nested subdirectories with same-named part files") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val tmp = Files.createTempDirectory("graft-dsv2-nested").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val changelog = Changelog.fromEvents(events)
    import spark.implicits._
    val mid = changelog.select("seq").as[Long].collect().sorted.apply(499)
    changelog.filter(col("seq") <= mid).coalesce(1)
      .write.parquet(s"$tmp/stage/lo")
    changelog.filter(col("seq") > mid).coalesce(1)
      .write.parquet(s"$tmp/stage/hi")

    // a rotated-log layout: both slices live in different subdirectories
    // under the SAME file name — a basename-keyed index would collapse them
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    def place(stage: String, dir: String): Unit = {
      val part = fs.listStatus(new Path(s"$tmp/stage/$stage")).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
      fs.mkdirs(new Path(dir))
      FileUtil.copy(fs, part, fs, new Path(s"$dir/data.parquet"), false, conf)
    }
    place("lo", s"$tmp/log/2024/01")
    place("hi", s"$tmp/log/2024/02")

    val schema = spark.read.parquet(s"$tmp/stage/lo").schema
    val index = new CdcLogIndex(schema, Map("path" -> s"$tmp/log"))
    assert(index.totalCount == 1000L)
    val all = index.partitionsFor(Long.MinValue, Long.MaxValue)
    assert(all.length == 2)
    assert(all.map(_.asInstanceOf[CdcFilePartition].url).distinct.length == 2)
    // a window inside the lo half prunes the hi file
    assert(index.partitionsFor(Long.MinValue, mid).length == 1)

    // executor-side read end-to-end over the nested layout (batch form)
    val got = spark.read.format(classOf[CdcSourceProvider].getName)
      .option("path", s"$tmp/log").load()
    assert(got.count() == 1000)
    assert(got.agg(min("seq"), max("seq")).collect().head ==
      changelog.agg(min("seq"), max("seq")).collect().head)
  }

  test("rowBudget: composite limits contribute maxRows; unknown shapes fall back to the peek limit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new CdcMicroBatchStream(
      new org.apache.spark.sql.types.StructType().add("seq", "long"),
      Map("path" -> "/nonexistent", "maxeventspertrigger" -> "123"))
    assert(stream.rowBudget(ReadLimit.maxRows(50)) == 50L)
    assert(stream.rowBudget(ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(10, 1000), ReadLimit.maxRows(77)))) == 77L)
    // composite WITHOUT a maxRows part → configured peek limit, not unlimited
    assert(stream.rowBudget(ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(10, 1000)))) == 123L)
    assert(stream.rowBudget(ReadLimit.allAvailable()) == Long.MaxValue)
    assert(stream.rowBudget(ReadLimit.minRows(10, 1000)) == 123L)
  }
}
