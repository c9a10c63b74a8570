package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import graft.dedup.Dedup

/** Streaming NEAR-dedup: the micro-batch surface of
  * [[graft.dedup.Dedup.dedupNearIncremental]] (the oracled
  * `neardedup_incremental` path), via the same `foreachBatch` idiom as
  * [[StreamingCdc]]. Each micro-batch drops documents whose estimated
  * Jaccard against ANY previously-seen document clears the threshold,
  * collapses the in-batch near-dup clusters, delivers the survivors,
  * and appends their MinHash signatures to a persistent parquet catalog
  * — (id, 64-lane signature) rows, `8k` bytes per doc, NEVER the text.
  *
  * Why foreachBatch + a parquet catalog instead of keyed GroupState:
  * a doc explodes into `bands` band keys, so "have I seen a near-dup"
  * is a multi-key rendezvous no single `groupByKey` state partition can
  * answer — and the signature set is exactly the state an incremental
  * BATCH pipeline already persists between crawls, so streaming and
  * batch share one catalog format (a stream can resume a crawl catalog
  * and vice versa). State grows with the SURVIVOR count, not the
  * ingest rate.
  *
  * Crash contract (commit-after-write, the repo-wide CDC rule): the
  * catalog append happens AFTER survivor delivery. A replayed batch
  * whose append already landed sees its own docs in the catalog and
  * emits nothing — replay converges (pinned in the spec). A crash
  * between delivery and append replays the batch's survivors downstream
  * once more: at-least-once, same as every sink in this engine.
  */
object StreamingNearDedup {

  private val CatalogSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("__sig", ArrayType(LongType), nullable = true)))

  /** The signature catalog, or the empty frame before first append. */
  def readCatalog(spark: SparkSession, catalogDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(catalogDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(CatalogSchema).parquet(catalogDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], CatalogSchema)
  }

  /** One micro-batch, pure enough to unit-test without the engine:
    * near-dedup `batch` against the catalog, append the survivors'
    * signatures, return the surviving (idCol, textCol) rows. */
  def applyBatch(
      batch: DataFrame, catalogDir: String, idCol: String, textCol: String,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val catalog = readCatalog(spark, catalogDir)
    // the engine re-plans foreachBatch frames; checkpoint so the
    // dedup's self-joins don't recompute the upstream per reference
    val docs = graft.ops.Checkpoints.pin(batch.select(col(idCol), col(textCol)))
    val survivors = graft.ops.Checkpoints.pin(Dedup.dedupNearIncremental(
      docs, catalog, idCol, textCol,
      shingleSize, bands, rowsPerBand,
      jaccardThreshold)) // deliver + append must see ONE survivor set
    deliver(survivors)
    Dedup.minhashNearCatalog(survivors, idCol, textCol,
        shingleSize, bands, rowsPerBand)
      .write.mode("append").parquet(catalogDir)
    survivors
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's
    * survivors (write them to the downstream sink there). */
  def writer(
      docs: DataFrame, catalogDir: String, checkpointDir: String,
      idCol: String, textCol: String,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow())(
      deliver: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val _ = applyBatch(batch, catalogDir, idCol, textCol,
            shingleSize, bands, rowsPerBand, jaccardThreshold, deliver)
        }
      }
}
