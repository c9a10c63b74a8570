package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.dedup.{ExactCatalog, Mp3Dedup}

/** Streaming wrapper for the MP3 frame-signature dedup tier
  * ([[graft.dedup.Mp3Dedup]]) — per-bucket hygiene and the versioned-
  * root lifecycle, exactly the [[StreamingMp4Dedup]] shape (the tier
  * IS one ExactCatalog, so the whole maintenance surface delegates). */
object StreamingMp3Dedup {

  def applyBatch(
      batch: DataFrame, catalogDir: String, idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val survivors = Mp3Dedup.applyBatch(
      batch, catalogDir, idCol, binCol, numBuckets, added,
      maxPushdownKeys, deliver)
    CatalogHygiene.afterAppend(
      compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
      ExactCatalog.bucketFileCounts(spark, catalogDir),
      ExactCatalog.compact(spark, catalogDir, _, _))
    survivors
  }

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
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    VersionedTier.run(spark, root,
      d => ExactCatalog.readMeta(spark, d).isDefined,
      maintainEvery, added,
      () => { val _ = ExactCatalog.maintainVersioned(spark, root, policy) })(
      serving => applyBatch(batch, serving, idCol, binCol, numBuckets,
        maxPushdownKeys, compactAboveFiles, added, retainAddedBehind,
        retentionSweepEvery, deliver))
  }
}
