package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.dedup.ExactCatalog

/** Streaming wrapper for the MP3 frame-signature dedup tier
  * ([[graft.dedup.Mp3Dedup]]) — a [[StreamingSigDedup]] binding:
  * per-bucket hygiene and the versioned-root lifecycle, exactly the
  * [[StreamingExactDedup]] shape. */
object StreamingMp3Dedup {

  def applyBatch(
      batch: DataFrame, catalogDir: String, idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame =
    StreamingSigDedup.applyBatch(
      graft.dedup.Mp3Dedup.applyBatch(_, _, _, _, _, _, _, _))(
      batch, catalogDir, idCol, binCol, numBuckets, maxPushdownKeys,
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery,
      deliver)

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT (see
    * [[VersionedTier]]): serving version resolved per trigger, tripped
    * Rebucket executed mid-stream, seen-set intact. */
  def applyBatchVersioned(
      batch: DataFrame, root: String, idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      maintainEvery: Long = 64L,
      deliver: DataFrame => Unit = _ => ()): DataFrame =
    StreamingSigDedup.applyBatchVersioned(
      serving => applyBatch(batch, serving, idCol, binCol, numBuckets,
        maxPushdownKeys, compactAboveFiles, added, retainAddedBehind,
        retentionSweepEvery, deliver))(
      batch.sparkSession, root, policy, maintainEvery, added)
}
