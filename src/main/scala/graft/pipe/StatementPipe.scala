package graft.pipe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.PipeConfig
import graft.ops.CoreOps
import graft.sinks.StatementSink
import graft.types.CHColumn

/** The pipe lifecycle — initialize → first_sync → sync_loop — over a LIVE
  * statement-executing sink (reference: `src/pipes/mod.rs:11-16`,
  * `src/pipes/postgres.rs:100-499`). This is the executing counterpart of
  * [[Pipe]] (whose sink is the parquet state log): same source seam, same
  * at-least-once contract, but writes go to a JDBC endpoint as the
  * reference's statement sequence.
  *
  * Error policy matches the reference exactly
  * (`src/pipes/postgres.rs:433-452`, knob defaults `src/config.rs:156-169`):
  *
  *  - peek fails → log, sleep `sleep_millis_when_peek_failed`, retry the
  *    same offset;
  *  - any write fails → log, sleep `sleep_millis_when_write_failed`,
  *    re-peek the SAME offset and replay the batch (peeks are
  *    non-consuming, so the batch returns identically). The offset
  *    commits only after every statement of the batch succeeded, so a
  *    replay is at-least-once, and the sink's last-wins dedup + PK upsert
  *    semantics make it idempotent at the target.
  *
  * Each failed attempt consumes one iteration of `maxIterations`, so
  * tests can bound a permanently-failing endpoint.
  */
class StatementPipe(
    config: PipeConfig,
    source: CdcSource,
    sink: StatementSink,
    offsets: FileOffsetStore,
    targetColumns: Seq[CHColumn],
    maskColumns: Set[String] = Set.empty,
    targetNonEmpty: () => Boolean = () => false,
    advance: Long => Unit = _ => (),
    sleeper: Long => Unit = Thread.sleep
)(implicit spark: SparkSession) {

  @volatile var lastError: Option[Throwable] = None

  def initialize(options: graft.ddl.TableOptions = graft.ddl.TableOptions()): Unit =
    sink.createTable(options)

  /** Bulk snapshot copy (EP2), skipped when the target is non-empty (K6 —
    * reference: `src/pipes/postgres.rs:145-160`). */
  def firstSync(): Boolean = {
    if (targetNonEmpty()) return false
    val snap = source.snapshot()
    if (snap.isEmpty) return false
    sink.bulkInsert(CoreOps.alignToTarget(snap, targetColumns, maskColumns))
    true
  }

  /** CDC loop (EP3): peek → apply → commit offset + advance cursor.
    * `live = true` keeps the loop alive on empty peeks with the
    * reference's cadence and retries failures forever (the reference's
    * run-forever loop); the default drains and stops (replay/test mode)
    * and rethrows after `maxConsecutiveFailures` attempts at one offset,
    * so deterministic failures fail the job rather than hang it.
    * Returns events applied. */
  def syncLoop(
      maxIterations: Long = Long.MaxValue, live: Boolean = false,
      maxConsecutiveFailures: Int = 10): Long = {
    var applied = 0L
    var iter = 0L
    var offset = offsets.read()
    var drained = false
    var failures = 0
    def failed(e: Exception, what: String, sleepMs: Long): Unit = {
      lastError = Some(e)
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
            val aligned = batch.select(
              (Seq(col("op"), col("seq")) ++
                targetColumns.map(c => col(c.name))): _*)
            // maxSeq is the FIRST action on the lazily-peeked batch —
            // transient failures here are peek failures and must follow
            // the same retry policy instead of escaping the loop
            val seqOpt =
              try Right(source.maxSeq(batch))
              catch { case e: Exception => Left(e) }
            seqOpt match {
              case Left(e) => failed(e, "peek", config.sleepWhenPeekFailed)
              case Right(None) =>
                if (live) sleeper(config.sleepWhenPeekIsEmpty)
                else drained = true
              case Right(Some(maxSeq)) =>
                try {
                  // count before the commit point: a post-commit failure
                  // could not be replayed (the next peek returns the NEXT
                  // batch), so it must not register as a write failure
                  val rows = batch.count()
                  sink.applyBatch(CoreOps.maskColumns(aligned, maskColumns))
                  // commit point: offset + cursor advance only after ALL
                  // statements of the batch succeeded (at-least-once)
                  offsets.write(maxSeq)
                  advance(maxSeq)
                  offset = maxSeq
                  applied += rows
                  failures = 0
                  sleeper(config.sleepAfterSyncWrite)
                  if (live) sleeper(config.sleepAfterSyncIteration)
                } catch {
                  case e: Exception =>
                    // offset unchanged → next peek replays the same batch
                    failed(e, "write", config.sleepWhenWriteFailed)
                }
            }
          } finally batch.unpersist()
      }
    }
    applied
  }

  def run(maxIterations: Long = Long.MaxValue, live: Boolean = false): Unit = {
    initialize()
    firstSync()
    if (!config.disableSyncLoop) syncLoop(maxIterations, live)
  }
}
