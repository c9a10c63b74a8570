package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.sim.SemDedup

/** Structured-Streaming wrap of the incremental semantic dedup
  * ([[SemDedup.applyBatchIndexed]]) — the embedding-level sibling of
  * [[StreamingNearDedup]]/[[StreamingExactDedup]]: each micro-batch
  * dedups in-batch and against the persistent IVF index's survivors,
  * `deliver` receives the survivors (write the downstream sink there —
  * the delivery-before-append crash contract), and the survivors'
  * vectors grow the index. State lives in the index directory, shared
  * with any batch-mode [[graft.sim.IvfIndex]] consumer. */
object StreamingSemDedup {

  def writer(
      docs: DataFrame, indexDir: String, checkpointDir: String,
      idCol: String, vecCol: String,
      threshold: Double, maxClusterSize: Int = 10000,
      trigger: Trigger = Trigger.AvailableNow())(
      deliver: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val _ = SemDedup.applyBatchIndexed(
            batch, indexDir, idCol, vecCol, threshold, maxClusterSize,
            deliver = deliver)
        }
      }
}
