package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.{AudioDedup, ExactCatalog, ImageDedup}

/** Streaming AUDIO dedup over the persistent envelope catalog — the
  * wrapper around [[AudioDedup.applyBatchEnvelope]] that carries the
  * family's hygiene and versioned-root surfaces (the tier previously
  * ran with inline hygiene inside [[StreamingCurate]]; one perceptual
  * tier subsumes byte-exact audio dedup, so unlike images this wrapper
  * owns a SINGLE catalog dir). Same at-least-once crash contract as
  * every tier: survivors delivered before the append, a replay whose
  * append landed is suppressive, downstream keeps the FIRST delivery
  * per id. */
object StreamingAudioDedup {

  /** One micro-batch through the envelope catalog + per-bucket hygiene
    * (see [[CatalogHygiene]]). */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val out = AudioDedup.applyBatchEnvelope(
      batch, dir, idCol, binCol, maxHamming, numBuckets, added,
      maxPushdownKeys, deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      ExactCatalog.bucketFileCounts(spark, dir),
      AudioDedup.compact(spark, dir, _, _))
    out
  }

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT (see
    * [[VersionedTier]]): serving catalog resolved per trigger, a tripped
    * Rebucket executed every `maintainEvery` batches through
    * [[ExactCatalog.maintainVersioned]] (kind-agnostic — the envelope
    * universe tag carries over) — mid-stream cutover, state intact. */
  def applyBatchVersioned(
      batch: DataFrame, root: String, idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
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
      serving => applyBatch(batch, serving, idCol, binCol, maxHamming,
        numBuckets, maxPushdownKeys, compactAboveFiles, added,
        retainAddedBehind, retentionSweepEvery, deliver))
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's audio
    * survivors. Catalog rows are tagged with the engine's batch id. */
  def writer(
      docs: DataFrame, dir: String, checkpointDir: String,
      idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
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
          val _ = applyBatch(batch, dir, idCol, binCol, maxHamming,
            numBuckets, maxPushdownKeys, compactAboveFiles,
            added = batchId, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery, deliver = deliver)
        }
      }
}
