package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CoreOps

/** Batch application semantics of the CDC sync loop — the reference's EP3
  * iteration order (reference: `src/pipes/postgres.rs:249-517`):
  *
  *  1. TRUNCATE executes immediately during routing — i.e. before this
  *     batch's queued writes (`pipes/postgres.rs:391-417`);
  *  2. upserts (I+U), deduplicated last-wins per PK
  *     (`adapter/mod.rs:258-269`), applied as ReplacingMergeTree-style
  *     replacement;
  *  3. deletes, applied AFTER the upserts of the same batch
  *     (`pipes/postgres.rs:422-485`) — so a delete wins over any upsert of
  *     the same key in the same batch, regardless of log order, and an
  *     upsert in a later batch resurrects the key.
  *
  * NOTE the routing/writing split means a TRUNCATE wipes prior state but
  * does NOT drop queued upserts of its own batch — even ones earlier in the
  * log. (FIXTURES.md §B.4 originally claimed otherwise; the reference code
  * is unambiguous.)
  */
object CdcApply {

  /** Apply one micro-batch of changelog rows to a state DataFrame.
    * `state` has columns pk ++ values; `batch` has op + seq + pk ++ values.
    * Idempotent: replaying the same batch yields the same state (§2.6).
    */
  def applyBatch(
      state: DataFrame,
      batch: DataFrame,
      pkCols: Seq[String],
      seqCol: String = "seq",
      opCol: String = "op"
  ): DataFrame = {
    // Upsert-replace semantics are DEFINED BY the key: with zero PK
    // columns the dedup would collapse the whole batch to one row and the
    // anti-joins would be degenerate — refuse loudly (a keyless table can
    // only be append-synced, not CDC-collapsed).
    require(pkCols.nonEmpty,
      "applyBatch requires primary-key columns (keyless tables cannot " +
        "take upsert/delete semantics)")
    val stateCols = state.columns.toIndexedSeq

    val hasTruncate = !batch.filter(col(opCol) === Changelog.OpTruncate).isEmpty
    val base = if (hasTruncate) state.limit(0) else state

    // agg-based dedup: map-side combine, no per-partition sort (WAL seqs
    // are distinct per key, so max_by is exact)
    val ups = CoreOps
      .dedupLastWinsAgg(CoreOps.upserts(batch, opCol), pkCols, seqCol)
      .select(stateCols.map(col): _*)

    // ReplacingMergeTree emulation: new version replaces prior row per PK.
    val afterUpserts = base
      .join(ups.select(pkCols.map(col): _*), pkCols, "left_anti")
      .unionByName(ups)

    val delKeys = CoreOps.deletes(batch, opCol).select(pkCols.map(col): _*).distinct()
    afterUpserts.join(delKeys, pkCols, "left_anti")
  }

  /** Run the full changelog as a sequence of micro-batches of `batchSize`
    * consecutive `seq` values — the test-scale driver loop (the streaming
    * path wraps the same applyBatch in foreachBatch). `localCheckpoint`
    * every few batches bounds plan depth.
    */
  def runLoop(
      changelog: DataFrame,
      pkCols: Seq[String],
      valueCols: Seq[String],
      batchSize: Long,
      seqCol: String = "seq"
  ): DataFrame = {
    val spark = changelog.sparkSession
    val withBatch = changelog.withColumn("__batch", floor(col(seqCol) / batchSize))
    val batchIds = withBatch
      .select("__batch").distinct().orderBy("__batch")
      .collect().map(_.getLong(0))

    val stateSchema = changelog.select((pkCols ++ valueCols).map(col): _*).schema
    var state = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

    batchIds.zipWithIndex.foreach { case (b, i) =>
      val batch = withBatch.filter(col("__batch") === b).drop("__batch")
      state = applyBatch(state, batch, pkCols, seqCol)
      if ((i + 1) % 4 == 0) state = graft.ops.Checkpoints.pin(state)
    }
    state
  }

  /** The same final state computed declaratively in ONE pass — the form
    * that scales: no driver loop, no per-batch barrier; a single hash
    * aggregation on the PK (one shuffle), so it survives a 100× scale-up
    * where the loop would not.
    *
    * Derivation: per key, let LU = the max-seq upsert, LD = the max-seq
    * delete, LT = the max-seq truncate (table-wide). Batches apply
    * upserts-then-deletes, and truncate wipes state at routing time, so the
    * key is present in the final state iff LU exists and
    *   batch(LU) > batch(LD)   (delete of the same batch or later wins)
    *   and batch(LU) >= batch(LT) (upserts of the truncate's own batch are
    *                               queued and applied after the wipe).
    * Its value is LU's after-image. Exactly applyBatch ∘ … ∘ applyBatch.
    */
  def finalStateDeclarative(
      changelog: DataFrame,
      pkCols: Seq[String],
      valueCols: Seq[String],
      batchSize: Long,
      seqCol: String = "seq",
      opCol: String = "op"
  ): DataFrame =
    finalState(changelog, pkCols, valueCols,
      floor(col(seqCol) / batchSize), seqCol, opCol)

  /** Generalized form: `batchCol` assigns each event to its micro-batch and
    * must be monotone non-decreasing in `seqCol` (batches are consecutive
    * WAL windows). The sink stamps real batch ids at append time and reuses
    * this as its merge view.
    */
  def finalState(
      changelog: DataFrame,
      pkCols: Seq[String],
      valueCols: Seq[String],
      batchCol: org.apache.spark.sql.Column,
      seqCol: String = "seq",
      opCol: String = "op"
  ): DataFrame = {
    val isUpsert = col(opCol).isin(Changelog.OpInsert, Changelog.OpUpdate)
    val isDelete = col(opCol) === Changelog.OpDelete

    // batch(max-seq upsert) == max batch over upserts, by monotonicity.
    // Upserts and deletes aggregate SEPARATELY: when the changelog arrives
    // already hash-partitioned by PK (e.g. straight out of the
    // after-image window), the wide upsert aggregation reuses that
    // partitioning with no new exchange; only the narrow (pk, batch)
    // delete stream shuffles. A union would invalidate the partitioning
    // and re-shuffle the full-width rows.
    val perKeyUps = changelog
      .filter(isUpsert)
      .groupBy(pkCols.map(col): _*)
      .agg(
        max(col(seqCol)).as("__lu"),
        max(batchCol).as("__lub"),
        max_by(struct(valueCols.map(col): _*), col(seqCol)).as("__img"))

    val perKeyDel = changelog
      .filter(isDelete)
      .groupBy(pkCols.map(col): _*)
      .agg(max(batchCol).as("__ldb"))

    // Truncates are rare, table-wide events: aggregate to a single row and
    // broadcast it — no second shuffle.
    val lt = changelog
      .filter(col(opCol) === Changelog.OpTruncate)
      .agg(max(batchCol).as("__ltb"))

    perKeyUps
      .join(perKeyDel, pkCols, "left_outer")
      .crossJoin(broadcast(lt))
      .filter(
        (col("__ldb").isNull || col("__lub") > col("__ldb")) &&
          (col("__ltb").isNull || col("__lub") >= col("__ltb"))
      )
      .select(pkCols.map(col) ++ valueCols.map(v => col(s"__img.$v").as(v)): _*)
  }
}
