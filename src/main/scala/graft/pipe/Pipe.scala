package graft.pipe

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.CdcApply
import graft.config.PipeConfig
import graft.ddl.{Ddl, TableOptions}
import graft.ops.CoreOps
import graft.types.CHColumn

/** A CDC change source: snapshot + peeked (non-consuming) change batches,
  * addressed by a monotone sequence number (the LSN analogue).
  * (reference: S1/S2 — `src/adapter/postgres.rs:787-910`).
  */
trait CdcSource {
  /** Full snapshot of the current table contents (S1/S3). */
  def snapshot(): DataFrame
  /** Next ≤ limit changelog rows with seq > after, WAL-ordered (S2/S4).
    * Peeking does NOT consume: the same rows return until committed. */
  def peekChanges(after: Long, limit: Long): DataFrame
  /** Max seq in a peeked batch (the offset to commit after writes).
    * Numeric-type tolerant: a live changelog table may declare its seq
    * column INT (JDBC metadata maps it to IntegerType), and an
    * asInstanceOf[Long] on the boxed Integer would ClassCastException. */
  def maxSeq(batch: DataFrame): Option[Long] =
    batch.agg(max(col("seq"))).collect().headOption.flatMap(r =>
      Option(r.get(0)).map {
        case n: Number => n.longValue
        case other => other.toString.toLong
      })
}

/** Replays a changelog DataFrame (derived from the `events` parquet) as a
  * CDC source — the test/bench stand-in for a live pgoutput slot.
  */
class ChangelogReplaySource(changelog: DataFrame, snapshotDf: Option[DataFrame] = None)
    extends CdcSource {
  private val log = changelog.cache()
  def snapshot(): DataFrame = snapshotDf.getOrElse(log.sparkSession.emptyDataFrame)
  def peekChanges(after: Long, limit: Long): DataFrame = {
    // WAL-ordered window: sort only the filtered tail, bounded by `limit`
    // (clamped: a Long config beyond Int.MaxValue must mean "unbounded",
    // not wrap to 0 or a negative limit).
    log.filter(col("seq") > after).orderBy(col("seq"))
      .limit(math.min(limit, Int.MaxValue.toLong).toInt)
  }
}

/** The at-least-once commit point: the offset is persisted only after the
  * batch's writes succeed (reference: `src/pipes/postgres.rs:487-499`,
  * resume-token file `src/pipes/mongodb.rs:259-302`).
  */
class FileOffsetStore(path: String) {
  def read(): Long = {
    val p = Paths.get(path)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong else -1L
  }
  def write(offset: Long): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, offset.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }
}

/** Opaque-string cursor store — the Mongo resume-token shape (the token
  * is a server-issued blob, not a number; persisted as a JSON file after
  * each committed batch — reference: `src/adapter/mongodb.rs:259-302`).
  */
class ResumeTokenStore(path: String) {
  def read(): Option[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val raw = new String(Files.readAllBytes(p), "UTF-8").trim
      // stored as {"resume_token": "..."} like the reference's file
      val m = """\{\s*"resume_token"\s*:\s*"(.*)"\s*\}""".r
      raw match {
        case m(tok) =>
          // undo the JSON escaping: '\' + c → c
          val sb = new StringBuilder
          var i = 0
          while (i < tok.length) {
            if (tok(i) == '\\' && i + 1 < tok.length) { sb += tok(i + 1); i += 2 }
            else { sb += tok(i); i += 1 }
          }
          Some(sb.toString)
        case _ => None
      }
    }
  }
  def write(token: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val escaped = token.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.write(p, s"""{"resume_token": "$escaped"}""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }
}

/** What a routed pipe needs from a per-table sink: apply one changelog
  * batch, and answer the K6 emptiness probe. [[ParquetStateSink]] is the
  * state-log implementation; [[graft.sinks.StatementSink.asBatchSink]]
  * adapts the live executing sink. */
trait BatchSink {
  def appendBatch(batch: DataFrame, batchId: Long): Unit
  def isEmpty: Boolean
}

/** ReplacingMergeTree-emulating state sink over parquet: storage is an
  * append-only changelog (cheap, partition-parallel writes — the analogue
  * of batched INSERTs into a ReplacingMergeTree part), and the *read* is
  * the same last-wins collapse the merge would perform
  * ([[CdcApply.finalStateDeclarative]] — one shuffle). `compact()` is the
  * forced merge (reference: `min_age_to_force_merge_seconds`,
  * `src/config.rs:113-116`).
  */
class ParquetStateSink(
    val path: String,
    pkCols: Seq[String],
    valueCols: Seq[String],
    mergeSchema: Boolean = false
)(implicit spark: SparkSession) extends BatchSink {
  private def logDir = s"$path/log"

  /** FS resolved from the sink PATH, not the default FS — an
    * hdfs://…/s3a://… sink probed through the local provider would look
    * permanently empty (and compact would swap on the wrong FS). */
  private def fs: org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isEmpty: Boolean = { // K6 emptiness probe
    recoverSwap()
    !fs.exists(new org.apache.hadoop.fs.Path(logDir))
  }

  /** K1/K2/K3 realized as one append: upserts, tombstones and truncate
    * markers all land in the log, stamped with the batch id; the
    * deletes-after-upserts / truncate-at-routing ordering lives entirely in
    * the collapse ([[CdcApply.finalState]]).
    * `batchId` must be monotone across appends (the pipe uses the batch's
    * max seq, which is monotone by WAL order).
    */
  def appendBatch(batch: DataFrame, batchId: Long): Unit = {
    val cols = Seq("op", "seq") ++ pkCols ++ valueCols
    batch.select(cols.map(col): _*)
      .withColumn("__batch", lit(batchId))
      .write.mode("append").parquet(logDir)
  }

  /** Current table contents (merge-time view): one shuffle on the PK.
    * `mergeSchema` unions the log files' schemas (footer reads, bounded
    * by file count) so a schema-evolving writer — the Mongo pipe, whose
    * batches gain columns as fields first appear — reads back with NULLs
    * for rows written before a column existed (no backfill). */
  def read(): DataFrame = {
    require(!isEmpty, s"state sink $path is empty") // isEmpty also recovers

    val log =
      if (mergeSchema) spark.read.option("mergeSchema", "true").parquet(logDir)
      else spark.read.parquet(logDir)
    CdcApply.finalState(log, pkCols, valueCols, col("__batch"))
  }

  /** Force-merge: rewrite the log as a single snapshot batch.
    *
    * Crash-safe swap: the old log is renamed ASIDE (log → log_old) before
    * the complete tmp snapshot takes its place, so every crash point
    * leaves a recoverable state ([[recoverSwap]]): before the first
    * rename the log is intact; between the renames both log_old and the
    * complete tmp exist; after the second only the log_old cleanup is
    * pending. A delete-then-rename swap would instead lose the table to a
    * crash between the delete and the rename. */
  def compact(): Unit = {
    val snap = read()
      .withColumn("op", lit("I"))
      .withColumn("seq", lit(0L))
      .withColumn("__batch", lit(0L))
    val tmp = s"$path/compact_tmp"
    snap.select((Seq("op", "seq") ++ pkCols ++ valueCols :+ "__batch").map(col): _*)
      .write.mode("overwrite").parquet(tmp)
    val f = fs
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val oldPath = new org.apache.hadoop.fs.Path(s"$path/log_old")
    f.delete(oldPath, true) // stale leftover from a recovered crash
    // Hadoop rename reports failure by RETURNING FALSE — an unchecked
    // swap followed by the old-log delete would destroy the only copy.
    // Every failure below leaves a recoverSwap()-able layout.
    if (!f.rename(logPath, oldPath)) throw new java.io.IOException(
      s"compact: rename $logPath -> $oldPath failed; log left in place")
    if (!f.rename(new org.apache.hadoop.fs.Path(tmp), logPath))
      throw new java.io.IOException(
        s"compact: rename $tmp -> $logPath failed; old log preserved at " +
          s"$oldPath for recoverSwap")
    f.delete(oldPath, true) // swap verified — only now drop the old log
  }

  /** Recover from a crash mid-[[compact]] swap. Called before reads:
    * if the log is missing, either the finished tmp snapshot (preferred —
    * it is complete by write-then-swap order) or the renamed-aside old
    * log is promoted back. */
  private def recoverSwap(): Unit = {
    val f = fs
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val oldPath = new org.apache.hadoop.fs.Path(s"$path/log_old")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$path/compact_tmp")
    if (!f.exists(logPath) && f.exists(oldPath)) {
      if (f.exists(tmpPath)) {
        if (!f.rename(tmpPath, logPath)) throw new java.io.IOException(
          s"recoverSwap: rename $tmpPath -> $logPath failed")
        f.delete(oldPath, true)
      } else if (!f.rename(oldPath, logPath)) throw new java.io.IOException(
        s"recoverSwap: rename $oldPath -> $logPath failed")
    }
  }
}

/** The pipe lifecycle — initialize → first_sync → sync_loop
  * (reference: `src/pipes/mod.rs:11-16`), over abstract source/sink.
  */
class Pipe(
    config: PipeConfig,
    source: CdcSource,
    sink: ParquetStateSink,
    offsets: FileOffsetStore,
    targetColumns: Seq[CHColumn],
    maskColumns: Set[String] = Set.empty,
    tableName: String = "t",
    database: String = "default",
    tableOptions: TableOptions = TableOptions()
)(implicit spark: SparkSession) {

  /** Emit the DDL the reference would run (K4); with a file-based sink the
    * "table" is the sink directory, so DDL is recorded, not executed. */
  def initialize(): String = {
    val ddl = Ddl.createTableQuery(database, tableName, targetColumns, tableOptions)
    val p = Paths.get(s"${sink.path}/_ddl.sql")
    Files.createDirectories(p.getParent)
    Files.write(p, ddl.getBytes("UTF-8"))
    ddl
  }

  /** Bulk snapshot copy (EP2): skipped when the target is non-empty (K6,
    * reference: `src/pipes/postgres.rs:145-160`). Alignment, masking and
    * casts run before the write (P1/P2/P5-P14).
    *
    * `progressOut` enables the reference's percent progress reporting
    * (`src/logger.rs:25-46`) driven by task output metrics while the
    * distributed copy runs. The denominator is a row ESTIMATE (S6 —
    * progress only, never correctness): pass the catalog's estimate via
    * `totalEstimate`; otherwise plan statistics are used, falling back to
    * a count only when neither exists (for parquet that is a
    * footer-metadata count, not a data scan).
    */
  def firstSync(
      progressOut: Option[String => Unit] = None,
      totalEstimate: Option[Long] = None): Boolean = {
    if (!sink.isEmpty) return false // re-running first_sync is a no-op
    val snap = source.snapshot()
    if (snap.isEmpty) return false
    val aligned = CoreOps.alignToTarget(snap, targetColumns, maskColumns)
      .withColumn("op", lit("I"))
      .withColumn("seq", lit(0L))
    progressOut match {
      case Some(out) =>
        val total = totalEstimate
          .orElse(snap.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong))
          .getOrElse(snap.count())
        Progress.withCopyProgress(spark, total, out, s"copy $tableName") {
          sink.appendBatch(aligned, batchId = 0L)
        }
      case None => sink.appendBatch(aligned, batchId = 0L)
    }
    true
  }

  /** CDC loop (EP3): peek → apply → commit offset. Bounded iterations for
    * tests; `Long.MaxValue` ≙ the reference's run-forever loop.
    *
    * `live = true` honors the reference's cadence (sleep after each
    * iteration, longer sleep on empty peek, stay alive — reference:
    * `src/config.rs:156-179`); the default drains and stops on the first
    * empty peek (replay/test mode). `sleeper` is injectable for tests.
    *
    * Error policy (reference: `src/pipes/postgres.rs:433-452`): a failed
    * peek sleeps `sleep_millis_when_peek_failed` and retries the same
    * offset; a failed write sleeps `sleep_millis_when_write_failed` and
    * replays the same batch (the offset is committed only after a
    * successful write, so the re-peek returns it unchanged). Every failed
    * attempt consumes one iteration.
    *
    * `live = true` retries forever, exactly the reference's run-forever
    * loop; non-live (batch/replay) runs rethrow after
    * `maxConsecutiveFailures` attempts at the same offset, so a
    * DETERMINISTIC failure (rejected SQL, schema mismatch, auth) fails
    * the job instead of hanging it.
    */
  def syncLoop(
      maxIterations: Long = Long.MaxValue,
      live: Boolean = false,
      sleeper: Long => Unit = Thread.sleep,
      maxConsecutiveFailures: Int = 10): Long = {
    var applied = 0L
    var iter = 0L
    var offset = offsets.read()
    var drained = false
    var failures = 0
    def failed(e: Exception, what: String, sleepMs: Long): Unit = {
      failures += 1
      if (!live && failures >= maxConsecutiveFailures) throw e
      System.err.println(s"[pipe] $what failed (${e.getMessage}); retrying")
      sleeper(sleepMs)
    }
    while (iter < maxIterations && !drained) {
      iter += 1
      val peeked =
        try Right(source.peekChanges(offset, config.peekChangesLimit).cache())
        catch { case e: Exception => Left(e) }
      peeked match {
        case Left(e) => failed(e, "peek", config.sleepWhenPeekFailed)
        case Right(batch) =>
          try {
            // maxSeq is the FIRST action on a lazily-peeked batch — a
            // transient failure here is a peek failure and must hit the
            // same retry policy, not escape the loop.
            val seqOpt =
              try Right(source.maxSeq(batch))
              catch { case e: Exception => Left(e) }
            seqOpt match {
              case Left(e) => failed(e, "peek", config.sleepWhenPeekFailed)
              case Right(None) =>
                if (live) sleeper(config.sleepWhenPeekIsEmpty)
                else drained = true // empty peek: replay mode stops
              case Right(Some(maxSeq)) =>
                try {
                  // count BEFORE the commit point: after offsets.write a
                  // failure here could not be replayed (the next peek
                  // returns the NEXT batch), so it must not look like a
                  // replayable write failure
                  val rows = batch.count()
                  // batch id = the batch's max seq: monotone across appends
                  // by WAL order, which is all finalState's collapse needs.
                  sink.appendBatch(batch, batchId = maxSeq)
                  offsets.write(maxSeq) // commit point: after successful write
                  offset = maxSeq
                  applied += rows
                  failures = 0
                  sleeper(config.sleepAfterSyncWrite)
                  if (live) sleeper(config.sleepAfterSyncIteration)
                } catch {
                  case e: Exception =>
                    // offset unchanged → the next peek replays this batch
                    // (an append that succeeded before a later failure
                    // re-appends on replay; the last-wins collapse makes
                    // that idempotent)
                    failed(e, "write", config.sleepWhenWriteFailed)
                }
            }
          } finally batch.unpersist()
      }
    }
    applied
  }

  def run(maxIterations: Long = Long.MaxValue): Unit = {
    initialize()
    firstSync()
    if (!config.disableSyncLoop) syncLoop(maxIterations)
  }
}
