package graft.mongo

import org.apache.spark.sql.SparkSession
import graft.config.PipeConfig
import graft.ops.CoreOps
import graft.pipe.{BatchSink, ResumeTokenStore}
import graft.types.CHColumn

/** The MongoDB pipe's sync loop with PER-BATCH schema evolution
  * (reference: `src/pipes/mongodb.rs:247-514`): each peeked change-stream
  * window first folds its after-images into the running first-type-wins
  * schema (`add_columns_to_table_if_not_exists`, `:306-333` — run on the
  * batch's rows BEFORE its INSERTs are generated), issues ADD COLUMN for
  * each newly-typed field, and only then routes the window's rows — so a
  * field lands starting with the batch where its first typed value
  * appeared, and rows synced earlier are never backfilled.
  *
  * Reference quirk, deliberately NOT reproduced: the reference's
  * `add_columns_to_table_if_not_exists` `continue`s unconditionally on
  * every `Nullable(_)` type (`src/pipes/mongodb.rs:688-698` — the
  * statement after the inner-Unknown check), and since every Mongo field
  * except `_id` maps to `Nullable(...)`
  * (`src/adapter/mongodb.rs:523-559`), the reference as written never
  * actually ADD-COLUMNs any document field — its Mongo targets evolve
  * only if a user pre-creates the full table. The surrounding structure
  * (per-batch fold, Unknown deferral, reload-after-add) makes the intent
  * unambiguous; we implement the intent and skip only Unknown.
  *
  * Seams: `addColumn` executes target DDL (dialect `ALTER TABLE … ADD
  * COLUMN` for live targets; no-op for the parquet state sink, whose
  * reader schema-merges), and `sinkFor` builds a batch sink bound to the
  * CURRENT schema — sinks are cheap rendering shells around a shared
  * client, so a fresh one per evolution step costs nothing.
  *
  * Error policy matches [[graft.pipe.StatementPipe]] (reference
  * `src/pipes/mongodb.rs:335-360`): a failed write sleeps
  * `sleep_millis_when_write_failed` and re-peeks the same window (the
  * resume token only commits after the write), so replays are
  * at-least-once and the sink's last-wins/upsert semantics make them
  * idempotent.
  */
class MongoPipe(
    config: PipeConfig,
    fetch: (Option[String], Long) => Seq[Array[Byte]],
    tokens: ResumeTokenStore,
    initial: Vector[CHColumn],
    addColumn: CHColumn => Unit,
    sinkFor: Seq[CHColumn] => BatchSink,
    maskColumns: Set[String] = Set.empty,
    maxAddColumnAttempts: Int = 5
)(implicit spark: SparkSession) {

  @volatile private var schemaNow: Vector[CHColumn] = initial

  /** The running schema (grows as batches introduce typed fields). */
  def schema: Vector[CHColumn] = schemaNow

  // field names the target permanently rejected: warned once, skipped
  // thereafter — one bad field must not wedge the pipe. Two routes in:
  // an IllegalArgumentException (our own dialects' "not a valid
  // identifier" signal) rejects immediately; any OTHER failure (e.g. a
  // SQLException for a reserved word, column-count limit, unsupported
  // type) is retried as transient up to `maxAddColumnAttempts` times
  // and THEN rejected — a target that deterministically refuses the
  // column would otherwise replay the same window forever in live mode
  private val rejected = scala.collection.mutable.Set.empty[String]
  private val addAttempts =
    scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)

  private def reject(c: CHColumn, e: Exception): Unit = {
    rejected += c.name
    addAttempts.remove(c.name)
    System.err.println(
      s"[pipe] mongo field '${c.name}' skipped: ${e.getMessage}")
  }

  private def evolve(events: Seq[ChangeStreamEvent]): Unit = {
    val next = MongoInference.foldBatch(schemaNow,
      events.flatMap(_.fullDocument)
        .map(_.fields.filterNot(f => rejected.contains(f._1))
          .map { case (n, v) => n -> v.kind }))
    // the schema advances PER successfully-added column, so a transient
    // failure on column k leaves columns <k recorded — the retried peek
    // re-proposes only the remainder instead of re-ADDing what already
    // exists (which would fail deterministically forever)
    next.drop(schemaNow.size).foreach { c =>
      try {
        addColumn(c)
        addAttempts.remove(c.name)
        schemaNow = schemaNow :+ c
      } catch {
        case e: IllegalArgumentException => reject(c, e)
        case e: Exception =>
          val n = addAttempts(c.name) + 1
          addAttempts(c.name) = n
          if (n >= maxAddColumnAttempts) reject(c, e)
          // propagate: the peek-failure path sleeps and replays this
          // window, re-proposing only the not-yet-added remainder
          else throw e
      }
    }
  }

  private[mongo] val source = new MongoChangeStreamSource(
    fetch, tokens, () => schemaNow.map(_.name),
    () => spark.emptyDataFrame, onWindow = evolve)

  /** Drain the recorded stream (replay) or poll forever (`live = true`),
    * one evolution step + one routed write per window. Returns events
    * applied. */
  def syncLoop(
      maxIterations: Long = Long.MaxValue,
      live: Boolean = false,
      sleeper: Long => Unit = Thread.sleep,
      maxConsecutiveFailures: Int = 10): Long = {
    var applied = 0L
    var offset = 0L
    var iter = 0L
    var drained = false
    var failures = 0
    while (iter < maxIterations && !drained) {
      iter += 1
      // evolution (ADD COLUMN) runs inside the peek via onWindow; a
      // failure there is a peek failure — sleep and retry the same
      // window, exactly like the reference's continue-'SYNC_LOOP
      // (`src/pipes/mongodb.rs:313-345`)
      val peeked =
        try Right(source.peekChanges(offset, config.peekChangesLimit).cache())
        catch { case e: Exception => Left(e) }
      peeked match {
        case Left(e) =>
          failures += 1
          if (!live && failures >= maxConsecutiveFailures) throw e
          System.err.println(
            s"[pipe] mongo peek/evolve failed (${e.getMessage}); retrying")
          sleeper(config.sleepWhenPeekFailed)
        case Right(batch) =>
          try {
            source.maxSeq(batch) match {
              case None =>
                if (live) sleeper(config.sleepWhenPeekIsEmpty) else drained = true
              case Some(maxSeq) =>
                try {
                  val sliced = ChangeStreamRows.tableSlice(batch, schemaNow)
                  val rows = batch.count() // before the commit point
                  sinkFor(schemaNow).appendBatch(
                    CoreOps.maskColumns(sliced, maskColumns), batchId = maxSeq)
                  // commit point: resume token persists only after the write
                  source.commitToken()
                  offset = maxSeq
                  applied += rows
                  failures = 0
                  sleeper(config.sleepAfterSyncWrite)
                  if (live) sleeper(config.sleepAfterSyncIteration)
                } catch {
                  case e: Exception =>
                    failures += 1
                    if (!live && failures >= maxConsecutiveFailures) throw e
                    System.err.println(
                      s"[pipe] mongo write failed (${e.getMessage}); replaying batch")
                    sleeper(config.sleepWhenWriteFailed)
                }
            }
          } finally batch.unpersist()
      }
    }
    applied
  }
}
