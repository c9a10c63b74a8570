package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.SparkTestBase

class StatefulOpsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("mapGroupsWithState user state: batch delete rule + resurrection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-state").toString

    val input = MemoryStream[ChangeEvent]
    // one continuous query: the memory sink cannot recover a checkpoint,
    // so batches are driven with processAllAvailable between addData calls
    val q = StatefulOps.userStateStream(input.toDS())
      .writeStream.format("memory").queryName("user_state_mem")
      .outputMode("update")
      .start()

    // batch 1: user 1 upserts then delete (delete wins), user 2 plain upsert
    input.addData(
      ChangeEvent("I", 1, 1, ts("2025-01-01 00:00:00"), 1.0, 1),
      ChangeEvent("U", 2, 1, ts("2025-01-01 00:00:01"), 3.0, 2),
      ChangeEvent("D", 3, 1, null, 0.0, 0),
      ChangeEvent("I", 4, 2, ts("2025-01-01 00:00:02"), 2.0, 1))
    q.processAllAvailable()

    val s1 = spark.table("user_state_mem").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s1(1L) == -1L) // tombstone: delete won the batch
    assert(s1(2L) == 1L)

    // batch 2: user 1 resurrects
    input.addData(ChangeEvent("I", 5, 1, ts("2025-01-01 00:01:00"), 9.0, 1))
    q.processAllAvailable()
    q.stop()
    val s2 = spark.table("user_state_mem").collect()
      .filter(r => r.getLong(0) == 1L && r.getLong(3) > 0)
    assert(s2.nonEmpty && s2.last.getLong(3) == 1L && s2.last.getDouble(2) == 9.0)
    val _ = tmp
  }

  test("a truncate marker clears the key, never applies its empty payload") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = StatefulOps.userStateStream(input.toDS())
      .writeStream.format("memory").queryName("user_state_trunc")
      .outputMode("update")
      .start()
    try {
      // upsert then a LATER truncate marker: the T row's zeroed payload
      // must not become the state — the key clears like a delete
      input.addData(
        ChangeEvent("I", 1, 7, ts("2025-01-01 00:00:00"), 5.0, 3),
        ChangeEvent("T", 2, 7, null, 0.0, 0))
      q.processAllAvailable()
      val s = spark.table("user_state_trunc").collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(s(7L) == -1L, s"expected tombstone for truncated key: $s")
    } finally q.stop()
  }

  test("flatMapGroupsWithState dedup: first occurrence only, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-ddstate").toString

    val input = MemoryStream[SeenDoc]
    val q = StatefulOps.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append")
      .start()

    input.addData(
      SeenDoc(1, 100L, "alpha"), SeenDoc(2, 100L, "alpha"), // dup in batch
      SeenDoc(3, 200L, "beta"))
    q.processAllAvailable()
    input.addData(
      SeenDoc(4, 100L, "alpha"),   // dup across batches
      SeenDoc(5, 100L, "gamma"),   // fp collision, different text -> kept
      SeenDoc(6, 300L, "delta"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_mem").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L, 6L))
    val _ = tmp
  }

  test("dedup state holds 8-byte content hashes, never texts") {
    // state growth is one Long per distinct doc, independent of text size
    val big = "x" * 10000
    val (h1, emit1) = StatefulOps.mergeSeen(Set.empty, Seq(
      SeenDoc(1, 7L, big), SeenDoc(2, 7L, big), SeenDoc(3, 7L, "other")))
    assert(emit1.map(_.doc_id) == List(1L, 3L)) // in-batch dup dropped
    assert(h1.length == 2) // exactly one Long per distinct text
    assert(h1.contains(StatefulOps.contentHash(big)))

    // replay across "batches": known hashes drop without any text compare
    val (h2, emit2) = StatefulOps.mergeSeen(h1.toSet, Seq(
      SeenDoc(4, 7L, big), SeenDoc(5, 7L, "third")))
    assert(emit2.map(_.doc_id) == List(5L))
    assert(h2 == List(StatefulOps.contentHash("third")))

    // collision discipline: same fp group, different texts → distinct
    // second hashes → both kept (pinned by the streaming test above too)
    assert(StatefulOps.contentHash("alpha") != StatefulOps.contentHash("gamma"))
  }

  test("content hash is independent of the fingerprint group key") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GraftHash
    // "bA" and "a`" are a REAL same-length fingerprint64 collision
    // (98*31+65 = 97*31+96 = 3103): under a salted-fingerprint64 second
    // hash these were GUARANTEED to collide too (fp64(salt+T) depends
    // only on len(T) and fp64(T)), silently dropping a distinct doc.
    val a = "bA"; val b = "a`"
    assert(GraftHash.fingerprint64(UTF8String.fromString(a)) ==
      GraftHash.fingerprint64(UTF8String.fromString(b)))
    assert(StatefulOps.contentHash(a) != StatefulOps.contentHash(b))
    // and the dedup step keeps BOTH distinct texts of the colliding group
    val fp = GraftHash.fingerprint64(UTF8String.fromString(a))
    val (_, emitted) = StatefulOps.mergeSeen(Set.empty, Seq(
      SeenDoc(1, fp, a), SeenDoc(2, fp, b)))
    assert(emitted.map(_.doc_id) == List(1L, 2L))
    // pinned to Spark's xxhash64 (seed 42): agrees with the dedup
    // catalog's xxhash64(text) secondKey column
    import spark.implicits._
    import org.apache.spark.sql.functions.xxhash64
    val sparkSide = Seq(a, b).toDF("t")
      .select(xxhash64($"t")).as[Long].collect().toSeq
    assert(sparkSide == Seq(StatefulOps.contentHash(a), StatefulOps.contentHash(b)))
  }

  test("watermarked windowed counts finalize deterministically (AvailableNow)") {
    val tmp = Files.createTempDirectory("graft-window").toString
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    events.write.mode("overwrite").parquet(s"$tmp/events")

    val stream = spark.readStream.schema(
      spark.read.parquet(s"$tmp/events").schema).parquet(s"$tmp/events")
    val q = StatefulOps.windowedCounts(stream, "ts", "1 hour", "1 day")
      .writeStream.format("memory").queryName("win_mem")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // append-mode emits only windows the watermark closed; every emitted
    // window must match the batch-mode count for the same window
    val got = spark.table("win_mem").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, n) => assert(want(k) == n, s"window $k") }
  }

  test("sessionizeStream: closed sessions match batch session_window exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("value"))
    val rows = events.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val maxTs = rows.map(_._1.getTime).max

    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StatefulOps.sessionizeStream(
        input.toDS().toDF("ts", "user_id", "value"),
        "ts", "user_id", "value", gap = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_mem")
      .outputMode(OutputMode.Append())
      .start()

    input.addData(rows.toSeq)
    q.processAllAvailable()
    // two sentinel batches: the first advances the watermark past every
    // real session's gap-extended end, the second gives the engine a batch
    // in which to emit the remaining closed sessions
    val sentinel1 = (new java.sql.Timestamp(maxTs + 86400000L), -1L, 0.0)
    val sentinel2 = (new java.sql.Timestamp(maxTs + 86500000L), -1L, 0.0)
    input.addData(sentinel1); q.processAllAvailable()
    input.addData(sentinel2); q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_mem").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
      .select(col("user_id"), col("session_window.start"),
        col("n_events"), col("session_value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want, s"stream ${got.size} sessions vs batch ${want.size}")
  }

  test("intervalJoin: stream-stream left outer equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val maxTs = ev.agg(max(col("ts"))).collect().head.getTimestamp(0).getTime

    val inL = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val inR = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = StatefulOps.intervalJoin(
        inL.toDS().toDF("event_id", "user_id", "ts"),
        inR.toDS().toDF("event_id", "user_id", "ts", "value"),
        "user_id", "ts", lookback = "1 hour", watermark = "0 seconds")
      .select(col("l_event_id"), col("r_event_id"))
      .writeStream.format("memory").queryName("ij_mem")
      .outputMode(OutputMode.Append())
      .start()

    inL.addData(clicks.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))))
    inR.addData(purchases.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))))
    q.processAllAvailable()
    // sentinels drive the watermark past every real event so unmatched
    // left rows flush; two rounds as with sessionizeStream
    (1 to 2).foreach { i =>
      inL.addData(Seq((-i.toLong, -1L, new java.sql.Timestamp(maxTs + i * 86400000L))))
      inR.addData(Seq((-i.toLong, -1L, new java.sql.Timestamp(maxTs + i * 86400000L), 0.0)))
      q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("ij_mem").collect()
      .filter(_.getLong(0) >= 0)
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val want = clicks.toDF("event_id", "user_id", "ts")
      .join(purchases.toDF("p_event_id", "p_user_id", "p_ts", "value"),
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("ts") - expr("INTERVAL 1 hour") &&
          col("p_ts") <= col("ts"),
        "leftOuter")
      .select(col("event_id"), col("p_event_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got == want, s"stream ${got.size} rows vs batch ${want.size}")
    assert(want.exists(_._2 >= 0) && want.exists(_._2 == -1L),
      "fixture must exercise both matched and unmatched rows")
  }

  test("curateStream: streaming curation equals batch curate, dups drop across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(100).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // planted dups arrive AFTER their originals (higher ids, second batch)
    val dups = base.take(10).map { case (id, t) => (id + 100000L, t) }
    val corpus = (base ++ dups).sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = graft.text.TrainingPipeline.curateStream(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        lang = "en", minQuality = 0.5)
      .writeStream.format("memory").queryName("curate_mem")
      .outputMode(OutputMode.Append())
      .start()
    val (b1, b2) = corpus.splitAt(60)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    val got = spark.table("curate_mem").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    val want = graft.text.TrainingPipeline.curate(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        lang = "en", minQuality = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // no planted dup survived (their originals arrived first)
    assert(!got.exists(_._1 >= 100000L))
  }
}
