package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.{ExactCatalog, SubstrCatalog}

/** Streaming SUBSTRING dedup over the persistent [[SubstrCatalog]] —
  * the span-level tier of the streaming dedup family
  * ([[StreamingExactDedup]] exact, [[StreamingNearDedup]] near,
  * [[StreamingSemDedup]] semantic): each micro-batch's documents are
  * scrubbed of every ≥w-token span whose windows the corpus has already
  * seen (Lee et al. 2022 semantics, keep-first-owner — the catalog
  * corpus owns by value, in-batch duplicates keep the lowest id), the
  * rewrites are delivered, and the batch's novel window fingerprints
  * advance the catalog.
  *
  * Unlike the other tiers this one emits a REWRITE, not a filter: the
  * output is `(id, n_tokens, n_removed, clean_text)` for EVERY batch
  * doc (unaffected docs pass through whitespace-normalized with
  * `n_removed` 0), so downstream keeps its row count and loses only the
  * repeated spans. The crash contract is correspondingly stricter to
  * read: rewrites are delivered BEFORE the append, so one
  * complete, correct delivery always precedes catalog advance; a
  * replayed batch whose append already landed is SUPPRESSIVE (its own
  * windows are catalog members — every ≥w-token doc scrubs to empty),
  * so downstream must be idempotent per doc id keeping the FIRST
  * delivered rewrite — see [[SubstrCatalog]].
  *
  * Retention (`retainAddedBehind`): an expired window value stops
  * suppressing — the next crawl to carry it is scrubbed nowhere, keeps
  * one copy, and re-enters it under the current tag. For boilerplate
  * that is exactly the refresh cadence a year-long pipeline wants.
  */
object StreamingSubstrDedup {

  /** One micro-batch: rewrite against the bucket-pruned catalog probe,
    * deliver, append the batch's novel window fps under `added`, then
    * auto-compact — PER BUCKET (`compactAboveFiles` is a per-bucket
    * file threshold; 0 disables), with a FULL retention sweep every
    * `retentionSweepEvery` batches when `retainAddedBehind` is set.
    * Same trigger/retention model as [[StreamingNearDedup.applyBatch]]
    * — see its scaladoc for why per-bucket is the only shape that
    * survives a catalog with more buckets than any global threshold. */
  def applyBatch(
      batch: DataFrame, catalogDir: String, idCol: String, textCol: String,
      w: Int,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val out = SubstrCatalog.applyBatch(
      batch, catalogDir, idCol, textCol, w, numBuckets, added,
      maxPushdownKeys, deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      ExactCatalog.bucketFileCounts(spark, catalogDir),
      SubstrCatalog.compact(spark, catalogDir, _, _))
    out
  }

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT (see
    * [[VersionedTier]]): serving version resolved per trigger, a tripped
    * Rebucket executed every `maintainEvery` batches through
    * [[SubstrCatalog.maintainVersioned]] — mid-stream cutover, window-fp
    * state intact. */
  def applyBatchVersioned(
      batch: DataFrame, root: String, idCol: String, textCol: String,
      w: Int,
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
      () => { val _ = SubstrCatalog.maintainVersioned(spark, root, policy) })(
      serving => applyBatch(batch, serving, idCol, textCol, w, numBuckets,
        maxPushdownKeys, compactAboveFiles, added, retainAddedBehind,
        retentionSweepEvery, deliver))
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's
    * rewrites (write them to the downstream sink there). Catalog rows
    * are tagged with the engine's batch id. */
  def writer(
      docs: DataFrame, catalogDir: String, checkpointDir: String,
      idCol: String, textCol: String, w: Int,
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
          val _ = applyBatch(batch, catalogDir, idCol, textCol, w,
            numBuckets, maxPushdownKeys, compactAboveFiles,
            added = batchId, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery,
            deliver = deliver)
        }
      }
}
