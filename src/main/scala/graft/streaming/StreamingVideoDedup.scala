package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.{ExactCatalog, ImageDedup, VideoCatalog, VideoDedup}

/** Streaming VIDEO dedup over the persistent [[VideoCatalog]] pair —
  * the fourth media wrapper ([[StreamingImageDedup]] images,
  * [[graft.dedup.AudioDedup.applyBatchEnvelope]] audio), same
  * at-least-once crash contract as every tier in the family: survivors
  * delivered before any append, a replay whose appends landed is
  * suppressive, downstream keeps the FIRST delivery per id. */
object StreamingVideoDedup {

  /** One micro-batch through the catalog + per-bucket hygiene on both
    * tiers (see [[CatalogHygiene]]; [[VideoCatalog.compact]] spans the
    * pair). */
  def applyBatch(
      batch: DataFrame, root: String, idCol: String, binCol: String,
      n: Int = VideoDedup.DefaultSampledFrames,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val out = VideoCatalog.applyBatch(
      batch, root, idCol, binCol, n, maxHamming, numBuckets, added,
      maxPushdownKeys, deliver = deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      VideoCatalog.bucketFileCounts(spark, root),
      VideoCatalog.compact(spark, root, _, _))
    out
  }

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT (see
    * [[VersionedTier]]): serving pair resolved per trigger, a tripped
    * Rebucket executed every `maintainEvery` batches through
    * [[VideoCatalog.maintainVersioned]] — mid-stream cutover, dedup
    * state intact. */
  def applyBatchVersioned(
      batch: DataFrame, root: String, idCol: String, binCol: String,
      n: Int = VideoDedup.DefaultSampledFrames,
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
      d => VideoCatalog.isCommitted(spark, d),
      maintainEvery, added,
      () => { val _ = VideoCatalog.maintainVersioned(spark, root, policy) })(
      serving => applyBatch(batch, serving, idCol, binCol, n, maxHamming,
        numBuckets, maxPushdownKeys, compactAboveFiles, added,
        retainAddedBehind, retentionSweepEvery, deliver))
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's video
    * survivors. Catalog rows are tagged with the engine's batch id. */
  def writer(
      docs: DataFrame, root: String, checkpointDir: String,
      idCol: String, binCol: String,
      n: Int = VideoDedup.DefaultSampledFrames,
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
          val _ = applyBatch(batch, root, idCol, binCol, n, maxHamming,
            numBuckets, maxPushdownKeys, compactAboveFiles,
            added = batchId, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery, deliver = deliver)
        }
      }
}
