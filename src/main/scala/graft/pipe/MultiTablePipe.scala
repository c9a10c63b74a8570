package graft.pipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.PipeConfig
import graft.ops.CoreOps
import graft.types.CHColumn

/** Per-table routing of a multi-table changelog (SURVEY.md sec 2.4 A3 —
  * the reference buckets each batch's events into per-table queues:
  * `src/pipes/postgres.rs:295-420`, `itertools.chunk_by` in
  * `src/pipes/mongodb.rs:294-303`).
  *
  * One [[ParquetStateSink]] per configured table; a batch is applied by
  * filtering the shared changelog per table (P3) and appending each slice
  * with the same batch id. Unknown tables are dropped with the reference's
  * warn-and-skip behavior (`pipes/postgres.rs:316-326`). Per-table,
  * per-op counters (A4) are observable from [[lastCounters]].
  */
class MultiTablePipe(
    config: PipeConfig,
    source: CdcSource,
    tables: Map[String, TableSpec],
    offsets: FileOffsetStore,
    tableCol: String = "table"
)(implicit spark: SparkSession) {

  @volatile var lastCounters: Seq[(String, String, Long)] = Seq.empty

  /** Snapshots are thunks: the K6 emptiness probe decides per table
    * whether the snapshot runs AT ALL, and an eager map would pull a full
    * COPY stream (or open a scan) for tables whose non-empty targets then
    * skip it (reference probes before copying:
    * `src/pipes/postgres.rs:145-160`). */
  def firstSync(snapshots: Map[String, () => DataFrame]): Unit =
    tables.foreach { case (name, spec) =>
      if (spec.sink.isEmpty) { // K6: skip non-empty targets
        snapshots.get(name).map(_.apply()).filter(!_.isEmpty).foreach { snap =>
          val aligned = CoreOps
            .alignToTarget(snap, spec.columns, spec.maskColumns)
            .withColumn("op", lit("I"))
            .withColumn("seq", lit(0L))
          spec.sink.appendBatch(aligned, batchId = 0L)
        }
      }
    }

  /** One sync iteration: peek → route per table → append → commit.
    * `sleeper` paces each table's write with
    * `sleep_millis_after_sync_write` (reference: `src/config.rs:176-179`,
    * applied between per-table write batches). */
  def syncOnce(sleeper: Long => Unit = _ => ()): Long = {
    val offset = offsets.read()
    val batch = source.peekChanges(offset, config.peekChangesLimit).cache()
    try {
      val last = source.maxSeq(batch)
      last match {
        case None => 0L
        case Some(maxSeq) =>
          // A4 counters computed once over the whole batch
          lastCounters = CoreOps.writeCounters(batch, tableCol, "op")
            .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
          // A3: per-table routing; unknown tables warn + skip. The batch's
          // distinct table set drives BOTH the warning and the routing
          // loop — tables absent from this batch get no per-table
          // filter/isEmpty jobs at all.
          val known = tables.keySet
          val present = batch.select(col(tableCol)).distinct()
            .collect().map(_.getString(0)).toSet
          (present -- known)
            .foreach(t => System.err.println(s"[pipe] unknown table '$t': skipped"))
          val rows = batch.count() // before the commit point
          tables.foreach { case (name, spec) =>
            if (present.contains(name)) {
              val slice = CoreOps
                .filterTables(batch, tableCol, Seq(name))
                .drop(tableCol)
              val aligned = slice.select(
                (Seq(col("op"), col("seq")) ++
                  spec.columns.map(c => col(c.name))): _*)
              spec.sink.appendBatch(
                CoreOps.maskColumns(aligned, spec.maskColumns), batchId = maxSeq)
              sleeper(config.sleepAfterSyncWrite) // per-table write pacing
            }
          }
          offsets.write(maxSeq) // commit AFTER all table writes (at-least-once)
          rows
      }
    } finally batch.unpersist()
  }

  /** Drain the source (test/replay mode). A failed iteration sleeps
    * `sleep_millis_when_write_failed` and retries: the offset only commits
    * after ALL table writes, so a partial batch replays whole, and
    * [[ParquetStateSink]] appends with the same batch id collapse
    * idempotently (last-wins by (batch, seq)). Deterministic failures
    * rethrow after `maxConsecutiveFailures` retries of the same batch. */
  def syncLoop(
      maxIterations: Long = Long.MaxValue,
      sleeper: Long => Unit = _ => (),
      maxConsecutiveFailures: Int = 10): Long = {
    var total = 0L
    var iter = 0L
    var drained = false
    var failures = 0
    while (iter < maxIterations && !drained) {
      iter += 1
      try {
        val n = syncOnce(sleeper)
        failures = 0
        if (n == 0) drained = true else total += n
      } catch {
        case e: Exception =>
          failures += 1
          if (failures >= maxConsecutiveFailures) throw e
          System.err.println(s"[pipe] sync failed (${e.getMessage}); replaying batch")
          sleeper(config.sleepWhenWriteFailed)
      }
    }
    total
  }
}

/** Target spec of one routed table. The sink is any [[BatchSink]] — the
  * parquet state log, or a live executing [[graft.sinks.StatementSink]]
  * through its adapter. */
case class TableSpec(
    columns: Seq[CHColumn],
    sink: BatchSink,
    maskColumns: Set[String] = Set.empty)
