package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.{ExactCatalog, ImageCatalog, ImageDedup}

/** Streaming IMAGE dedup over the persistent [[ImageCatalog]] pair —
  * byte-exact tier first (an exact drop never pays a pixel decode), the
  * perceptual tier nested inside its delivery position so every catalog
  * append lands after the final delivery (the [[StreamingCurate]]
  * composition shape; same at-least-once crash contract as every tier in
  * the family: a replay whose appends landed is suppressive, downstream
  * keeps the FIRST delivery per id). */
object StreamingImageDedup {

  /** One micro-batch through both tiers + per-bucket catalog hygiene
    * (see [[CatalogHygiene]]) on both catalogs. */
  def applyBatch(
      batch: DataFrame, exactDir: String, phashDir: String,
      idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      compactAboveFiles: Int = 16,
      added: Long = 0L,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val survivors = ImageCatalog.applyBatch(
      batch, exactDir, phashDir, idCol, binCol, maxHamming,
      numBuckets, added, maxPushdownKeys, deliver)
    Seq(exactDir, phashDir).foreach { dir =>
      CatalogHygiene.afterAppend(
        compactAboveFiles, added, retainAddedBehind, retentionSweepEvery)(
        ImageCatalog.bucketFileCounts(spark, dir),
        ImageCatalog.compact(spark, dir, _, _))
    }
    survivors
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's image
    * survivors. Catalog rows are tagged with the engine's batch id. */
  def writer(
      docs: DataFrame, exactDir: String, phashDir: String,
      checkpointDir: String, idCol: String, binCol: String,
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
          val _ = applyBatch(batch, exactDir, phashDir, idCol, binCol,
            maxHamming, numBuckets, maxPushdownKeys, compactAboveFiles,
            added = batchId, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery, deliver = deliver)
        }
      }
}
