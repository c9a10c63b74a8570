package graft.pipe

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.cdc.Changelog
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.types.{CHColumn, CHType}

/** End-to-end slice (SURVEY.md §7.2): events parquet → changelog → replay
  * source → pipe loop → parquet state sink, checked against an independent
  * plain-Scala fold of the same semantics (upserts deduped last-wins, then
  * deletes, per batch).
  */
class PipeSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def cfg(peekLimit: Long) = PipeConfig(
    SourceConfig("parquet", parquet_dir = Some(sfDir)),
    TargetConfig("parquet"),
    peek_changes_limit = Some(peekLimit))

  private val targetCols = Seq(
    CHColumn("user_id", CHType.Int64, isPrimaryKey = true),
    CHColumn("last_ts", CHType.CHDateTime().nullable),
    CHColumn("total_value", CHType.Float64.nullable),
    CHColumn("n_events", CHType.Int64.nullable)
  )

  // Independent oracle: collect the changelog and fold it on the driver
  // with the reference's batch semantics (dedup-last-wins upserts applied
  // first, deletes second, batches = consecutive `peekLimit`-sized windows).
  private def driverOracle(
      rows: Seq[(Long, String, Long)], peekLimit: Int): Set[Long] = {
    var state = Set.empty[Long]
    rows.sortBy(_._1).grouped(peekLimit).foreach { batch =>
      val ups = batch.filter(e => e._2 == "I" || e._2 == "U").map(_._3)
      val dels = batch.filter(_._2 == "D").map(_._3).toSet
      state = (state ++ ups) -- dels
    }
    state
  }

  test("pipe end-to-end on sf0.001 events matches driver-side fold; re-run is a no-op") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).cache()

    val tmp = Files.createTempDirectory("graft-pipe").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val offsets = new FileOffsetStore(s"$tmp/offset")
    val source = new ChangelogReplaySource(changelog)
    val pipe = new Pipe(cfg(100L), source, sink, offsets, targetCols,
      tableName = "user_state")

    pipe.run()
    val got = sink.read().select("user_id").collect().map(_.getLong(0)).toSet

    val raw = changelog.select("seq", "op", "user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = driverOracle(raw, 100)
    assert(got == want)
    assert(got.nonEmpty)

    // values: per surviving key, the after-image of its max-seq upsert
    val lastUp = raw.filter(e => e._2 != "D").groupBy(_._3).map { case (k, es) => k -> es.map(_._1).max }
    val imgs = changelog.filter(col("op") =!= "D")
      .select("user_id", "seq", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gotVals = sink.read().select("user_id", "n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotVals.foreach { case (k, n) => assert(n == imgs((k, lastUp(k))), s"key $k") }

    // re-run: firstSync skips (non-empty sink), syncLoop finds no new seq
    val before = sink.read().count()
    pipe.run()
    assert(sink.read().count() == before)

    // DDL got recorded
    val ddl = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/state/_ddl.sql")), "UTF-8")
    assert(ddl.contains("ReplacingMergeTree"))
    assert(ddl.contains("ORDER BY (user_id)"))
  }

  test("live cadence: sleeps after iterations and on empty peek; resume token round-trips") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).limit(150).cache()
    val tmp = Files.createTempDirectory("graft-live").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val pipe = new Pipe(cfg(100L), new ChangelogReplaySource(changelog), sink,
      new FileOffsetStore(s"$tmp/offset"), targetCols)

    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    pipe.initialize(); pipe.firstSync()
    pipe.syncLoop(maxIterations = 4, live = true, sleeper = sleeps += _)
    // 2 data iterations (150 events / peek 100) then empty peeks; each data
    // iteration sleeps after-write AND after-iteration (both default 100ms)
    assert(sleeps.count(_ == 100L) == 4, s"sleeps: $sleeps")
    assert(sleeps.count(_ == 5000L) == 2, s"sleeps: $sleeps") // empty-peek

    val tokens = new ResumeTokenStore(s"$tmp/token.json")
    assert(tokens.read().isEmpty)
    tokens.write("""82649B3C00:  "quoted" \ token""")
    assert(tokens.read().contains("""82649B3C00:  "quoted" \ token"""))
  }

  test("compact mid-stream: continuing CDC after a force-merge converges identically") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).cache()
    def runPipe(compactAfter: Option[Long]): Seq[org.apache.spark.sql.Row] = {
      val tmp = Files.createTempDirectory("graft-midcompact").toString
      val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
        Seq("last_ts", "total_value", "n_events"))
      val pipe = new Pipe(cfg(200L), new ChangelogReplaySource(changelog), sink,
        new FileOffsetStore(s"$tmp/offset"), targetCols)
      pipe.initialize(); pipe.firstSync()
      compactAfter match {
        case Some(n) =>
          pipe.syncLoop(maxIterations = n)
          sink.compact() // force-merge mid-stream (min_age_to_force_merge analogue)
          pipe.syncLoop() // drain the rest against the compacted log
        case None => pipe.syncLoop()
      }
      sink.read().orderBy("user_id").collect().toSeq
    }
    assert(runPipe(Some(2L)) == runPipe(None))
  }

  test("compact preserves state") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events)
    val tmp = Files.createTempDirectory("graft-compact").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val offsets = new FileOffsetStore(s"$tmp/offset")
    val pipe = new Pipe(cfg(250L), new ChangelogReplaySource(changelog), sink,
      offsets, targetCols)
    pipe.run()
    val before = sink.read().orderBy("user_id").collect().toSeq
    sink.compact()
    val after = sink.read().orderBy("user_id").collect().toSeq
    assert(before.map(_.getLong(0)) == after.map(_.getLong(0)))
  }

  test("compact swap is crash-safe: every interruption point recovers") {
    import org.apache.hadoop.fs.Path
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).limit(50).cache()
    val tmp = Files.createTempDirectory("graft-compact-crash").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    new Pipe(cfg(50L), new ChangelogReplaySource(changelog), sink,
      new FileOffsetStore(s"$tmp/offset"), targetCols,
      tableName = "t").syncLoop(sleeper = _ => ())
    val want = sink.read().orderBy("user_id").collect().toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

    // crash point A: old log renamed aside, complete tmp not yet promoted
    sink.compact() // leaves a clean log; now simulate the torn state
    val base = s"$tmp/state"
    fs.rename(new Path(s"$base/log"), new Path(s"$base/compact_tmp"))
    fs.mkdirs(new Path(s"$base/log_old")) // stale old log (content irrelevant)
    assert(!sink.isEmpty) // recovery promotes the complete tmp
    assert(sink.read().orderBy("user_id").collect().toSeq == want)
    assert(!fs.exists(new Path(s"$base/log_old")))

    // crash point B: old log renamed aside, tmp never finished (absent)
    fs.rename(new Path(s"$base/log"), new Path(s"$base/log_old"))
    assert(!sink.isEmpty) // recovery restores the old log
    assert(sink.read().orderBy("user_id").collect().toSeq == want)
  }

  test("write failure: sleep sleep_millis_when_write_failed, replay batch, identical final state") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).limit(100).cache()

    val tmp = Files.createTempDirectory("graft-pipe-retry").toString
    var failures = 2
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events")) {
      override def appendBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        if (failures > 0) { failures -= 1; sys.error("sink down") }
        super.appendBatch(batch, batchId)
      }
    }
    val offsets = new FileOffsetStore(s"$tmp/offset")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pipe = new Pipe(
      PipeConfig(SourceConfig("parquet"), TargetConfig("parquet"),
        peek_changes_limit = Some(50L),
        sleep_millis_when_write_failed = Some(77L),
        sleep_millis_after_sync_write = Some(3L)),
      new ChangelogReplaySource(changelog), sink, offsets, targetCols,
      tableName = "user_state")

    val applied = pipe.syncLoop(maxIterations = 10, sleeper = sleeps += _)
    // two failed attempts slept the write-failed knob, then both batches land
    assert(sleeps.count(_ == 77L) == 2)
    assert(sleeps.count(_ == 3L) == 2) // sleep_millis_after_sync_write per write
    assert(applied == 100)

    // final state identical to a clean run over the same changelog
    val tmp2 = Files.createTempDirectory("graft-pipe-clean").toString
    val cleanSink = new ParquetStateSink(s"$tmp2/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    new Pipe(cfg(50L), new ChangelogReplaySource(changelog), cleanSink,
      new FileOffsetStore(s"$tmp2/offset"), targetCols,
      tableName = "user_state").syncLoop(sleeper = _ => ())
    assert(sink.read().orderBy("user_id").collect().toSeq ==
      cleanSink.read().orderBy("user_id").collect().toSeq)
    // offset advanced to the end exactly once per batch despite retries
    assert(offsets.read() == new FileOffsetStore(s"$tmp2/offset").read())
  }

  test("deterministic failure rethrows after maxConsecutiveFailures (non-live only)") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).limit(10).cache()
    val tmp = Files.createTempDirectory("graft-pipe-permfail").toString
    var attempts = 0
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events")) {
      override def appendBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        attempts += 1; sys.error("permanently broken")
      }
    }
    val pipe = new Pipe(cfg(100L), new ChangelogReplaySource(changelog), sink,
      new FileOffsetStore(s"$tmp/offset"), targetCols, tableName = "t")
    val e = intercept[RuntimeException](
      pipe.syncLoop(sleeper = _ => (), maxConsecutiveFailures = 3))
    assert(e.getMessage == "permanently broken")
    assert(attempts == 3) // retried, then failed fast — no infinite loop
  }

  test("peek failure: sleep sleep_millis_when_peek_failed and retry the same offset") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val changelog = Changelog.fromEvents(events).limit(20).cache()
    val tmp = Files.createTempDirectory("graft-pipe-peekfail").toString
    var peekFailures = 3
    val flaky = new CdcSource {
      private val inner = new ChangelogReplaySource(changelog)
      def snapshot() = inner.snapshot()
      def peekChanges(after: Long, limit: Long) = {
        if (peekFailures > 0) { peekFailures -= 1; sys.error("peek down") }
        inner.peekChanges(after, limit)
      }
    }
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pipe = new Pipe(
      PipeConfig(SourceConfig("parquet"), TargetConfig("parquet"),
        sleep_millis_when_peek_failed = Some(55L)),
      flaky, sink, new FileOffsetStore(s"$tmp/offset"), targetCols,
      tableName = "user_state")
    val applied = pipe.syncLoop(maxIterations = 10, sleeper = sleeps += _)
    assert(sleeps.count(_ == 55L) == 3)
    assert(applied == 20)
  }
}
