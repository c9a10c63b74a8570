package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.ExactCatalog

/** Streaming EXACT dedup over the persistent [[ExactCatalog]] — the
  * catalog-backed twin of [[StatefulOps.dedupStream]] and the exact-tier
  * sibling of [[StreamingNearDedup]].
  *
  * When to use which: `dedupStream` keeps its seen-set in the engine's
  * state store — self-contained, but the state belongs to ONE streaming
  * query and dies with its checkpoint. This wrapper keeps the seen-set
  * in the shared `(fp, h2, added)` catalog, so batch crawls and any
  * number of (sequential) streaming queries deduplicate against the
  * SAME corpus memory, retention ages out dead crawls
  * ([[ExactCatalog.compact]]), and a restarted query resumes from the
  * catalog rather than an engine checkpoint.
  *
  * Crash contract (same as the near tier): survivors are DELIVERED
  * before their fingerprints land in the catalog, so a crash anywhere
  * replays the batch into at-least-once delivery — never at-most-once
  * loss. A replayed batch whose append already landed sees its own
  * fingerprints and emits nothing (replay converges).
  */
object StreamingExactDedup {

  /** One micro-batch: dedup against the bucket-pruned catalog read,
    * deliver survivors, append their fingerprints under `added`, then
    * auto-compact — PER BUCKET (`compactAboveFiles` is a per-bucket
    * file threshold; 0 disables), with a FULL retention sweep every
    * `retentionSweepEvery` batches when `retainAddedBehind` is set.
    * Same trigger/retention model as [[StreamingNearDedup.applyBatch]]
    * — see its scaladoc for why per-bucket is the only shape that
    * survives a catalog with more buckets than any global threshold. */
  def applyBatch(
      batch: DataFrame, catalogDir: String, idCol: String, textCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val survivors = ExactCatalog.applyBatch(
      batch, catalogDir, idCol, textCol, numBuckets, added,
      maxPushdownKeys, deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      ExactCatalog.bucketFileCounts(spark, catalogDir),
      ExactCatalog.compact(spark, catalogDir, _, _))
    survivors
  }

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT (see
    * [[VersionedTier]]): serving version resolved per trigger, a tripped
    * Rebucket executed every `maintainEvery` batches through
    * [[ExactCatalog.maintainVersioned]] — mid-stream cutover, seen-set
    * intact. */
  def applyBatchVersioned(
      batch: DataFrame, root: String, idCol: String, textCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      maintainEvery: Long = 64L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    VersionedTier.run(spark, root,
      d => ExactCatalog.readMeta(spark, d).isDefined,
      maintainEvery, added,
      () => { val _ = ExactCatalog.maintainVersioned(spark, root, policy) })(
      serving => applyBatch(batch, serving, idCol, textCol, numBuckets,
        maxPushdownKeys, compactAboveFiles, added, retainAddedBehind,
        retentionSweepEvery, deliver))
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's
    * survivors (write them to the downstream sink there). Catalog rows
    * are tagged with the engine's batch id. */
  def writer(
      docs: DataFrame, catalogDir: String, checkpointDir: String,
      idCol: String, textCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      trigger: Trigger = Trigger.AvailableNow())(
      deliver: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val _ = applyBatch(batch, catalogDir, idCol, textCol,
            numBuckets, maxPushdownKeys, compactAboveFiles,
            added = batchId, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery,
            deliver = deliver)
        }
      }
}
