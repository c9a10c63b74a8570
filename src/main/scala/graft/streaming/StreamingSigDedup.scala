package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.dedup.ExactCatalog

/** The shared streaming wrapper for the [[graft.dedup.SigDedup]]
  * media-signature tiers — per-bucket hygiene and the versioned-root
  * lifecycle, exactly the [[StreamingExactDedup]] shape (each tier IS
  * one ExactCatalog, so the whole maintenance surface delegates).
  * [[StreamingMp4Dedup]], [[StreamingMp3Dedup]] and
  * [[StreamingFlacDedup]] are thin bindings. */
private[streaming] object StreamingSigDedup {

  def applyBatch(
      apply: (DataFrame, String, String, String, Int, Long, Int,
        DataFrame => Unit) => DataFrame)(
      batch: DataFrame, catalogDir: String, idCol: String, binCol: String,
      numBuckets: Int, maxPushdownKeys: Int, compactAboveFiles: Int,
      added: Long, retainAddedBehind: Option[Long],
      retentionSweepEvery: Long, deliver: DataFrame => Unit): DataFrame = {
    val spark = batch.sparkSession
    val survivors = apply(batch, catalogDir, idCol, binCol, numBuckets,
      added, maxPushdownKeys, deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      ExactCatalog.bucketFileCounts(spark, catalogDir),
      ExactCatalog.compact(spark, catalogDir, _, _))
    survivors
  }

  def applyBatchVersioned(
      perDir: String => DataFrame)(
      spark: org.apache.spark.sql.SparkSession, root: String,
      policy: graft.ops.GrowthPolicy.Policy, maintainEvery: Long,
      added: Long): DataFrame =
    VersionedTier.run(spark, root,
      d => ExactCatalog.readMeta(spark, d).isDefined,
      maintainEvery, added,
      () => { val _ = ExactCatalog.maintainVersioned(spark, root, policy) })(
      perDir)
}

/** Streaming wrapper for the FLAC stream-signature dedup tier
  * ([[graft.dedup.FlacDedup]]). */
object StreamingFlacDedup {

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
      graft.dedup.FlacDedup.applyBatch(_, _, _, _, _, _, _, _))(
      batch, catalogDir, idCol, binCol, numBuckets, maxPushdownKeys,
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery,
      deliver)

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT. */
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

/** Streaming wrapper for the Ogg packet-signature dedup tier
  * ([[graft.dedup.OggDedup]]). */
object StreamingOggDedup {

  def applyBatch(
      batch: org.apache.spark.sql.DataFrame, catalogDir: String,
      idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: org.apache.spark.sql.DataFrame => Unit = _ => ())
      : org.apache.spark.sql.DataFrame =
    StreamingSigDedup.applyBatch(
      graft.dedup.OggDedup.applyBatch(_, _, _, _, _, _, _, _))(
      batch, catalogDir, idCol, binCol, numBuckets, maxPushdownKeys,
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery,
      deliver)

  /** [[applyBatch]] against a [[graft.ops.VersionedStore]] ROOT. */
  def applyBatchVersioned(
      batch: org.apache.spark.sql.DataFrame, root: String,
      idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      maintainEvery: Long = 64L,
      deliver: org.apache.spark.sql.DataFrame => Unit = _ => ())
      : org.apache.spark.sql.DataFrame =
    StreamingSigDedup.applyBatchVersioned(
      serving => applyBatch(batch, serving, idCol, binCol, numBuckets,
        maxPushdownKeys, compactAboveFiles, added, retainAddedBehind,
        retentionSweepEvery, deliver))(
      batch.sparkSession, root, policy, maintainEvery, added)
}
