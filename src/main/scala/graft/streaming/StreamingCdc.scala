package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.pipe.ParquetStateSink

/** Structured-Streaming surface of the CDC loop: the same batch semantics
  * as [[graft.pipe.Pipe.syncLoop]], driven by Spark's micro-batch engine
  * instead of the polling driver loop (SURVEY.md sec 2.6 — checkpointed
  * offsets give the identical at-least-once, commit-after-write contract;
  * idempotence comes from the sink's last-wins collapse, so replaying a
  * batch after a crash converges to the same state).
  *
  * The changelog stream must carry (op, seq, pk..., value...) rows — any
  * streaming source works (Kafka, file drop, rate, MemoryStream in tests);
  * a live pgoutput slot would adapt S2 peeks into such a stream.
  */
object StreamingCdc {

  /** foreachBatch writer applying each micro-batch to the state sink.
    * Batch ids from the streaming engine are monotone — exactly what the
    * sink's collapse requires. The epoch is offset by `epochBase` so
    * appends after a restart keep increasing. */
  def writer(
      changelog: DataFrame,
      sink: ParquetStateSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      epochBase: Long = 1L): DataStreamWriter[Row] =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) sink.appendBatch(batch, epochBase + epochId)
      }

  /** Run to completion of available data (the streaming analogue of the
    * test-mode sync loop draining the replay source). */
  def runAvailableNow(
      changelog: DataFrame,
      sink: ParquetStateSink,
      checkpointDir: String): StreamingQuery = {
    val q = writer(changelog, sink, checkpointDir).start()
    q.awaitTermination()
    q
  }

  /** Same micro-batch engine driving the LIVE statement sink: each batch
    * applies as the reference's truncate → deduped INSERTs → DELETE
    * sequence ([[graft.sinks.StatementSink]]); checkpointed offsets give
    * commit-after-write at-least-once, and ReplacingMergeTree's last-wins
    * collapse makes replays converge — the full reference contract on
    * Structured Streaming. */
  def statementWriter(
      changelog: DataFrame,
      sink: graft.sinks.StatementSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { val _ = sink.applyBatch(batch) }
      }
}
