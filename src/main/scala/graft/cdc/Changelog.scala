package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog derivation from the driver's `events` app-event table
  * (FIXTURES.md §A.1): a deterministic CDC op-log over a keyed state table
  * `user_state(user_id PK, last_ts, total_value, n_events)`.
  *
  *  - `seq` = `event_id` (monotone; plays the WAL LSN — SURVEY §2 S2)
  *  - op: `signup` → I, `click|view|purchase` → U (full after-image,
  *    UpdateLookup-style — SURVEY §2 S4), `error` → D (key only —
  *    SURVEY §2 D8)
  *  - after-image at an upsert event e = (user_id, last_ts = e.ts,
  *    total_value = running sum of value, n_events = running count) over
  *    the user's upsert events ordered by seq.
  *
  * One shuffle (partitionBy user_id); the running aggregates are computed
  * with an ordered window, which keeps double addition order deterministic
  * for oracle parity.
  */
object Changelog {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"
  val OpTruncate = "T"

  def fromEvents(events: DataFrame): DataFrame = {
    val typed = events.withColumn(
      "op",
      when(col("event_type") === "signup", OpInsert)
        .when(col("event_type") === "error", OpDelete)
        .otherwise(OpUpdate)
    )
    // Single pass — no union (a union would scan the source twice and
    // destroy the window's partitioning for downstream consumers): the
    // running after-image aggregates are CONDITIONAL window functions, so
    // delete rows ride along in the same partition and simply carry null
    // values, exactly what the delete-event shape requires (D8: key only).
    val isUpsert = col("op") =!= OpDelete
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    typed.select(
      col("event_id").as("seq"),
      col("op"),
      col("user_id"),
      when(isUpsert, col("ts")).as("last_ts"),
      when(isUpsert, sum(when(isUpsert, col("value"))).over(w)).as("total_value"),
      when(isUpsert, count(when(isUpsert, lit(1))).over(w)).as("n_events")
    )
  }

  /** Changelog derivation + CDC final state FUSED into one window pass —
    * the plan you want at scale: the running after-image aggregates and
    * the whole-partition last-upsert/last-delete markers are conditional
    * window functions over the SAME hash partitioning (user_id), so the
    * whole computation is ONE exchange + one sort, no union, no join, no
    * re-aggregation. Result provably equals
    * `CdcApply.finalStateDeclarative(fromEvents(events), ...)`:
    * the kept row is the max-seq upsert, its running aggregates are the
    * after-image, and the batch comparisons reproduce the
    * deletes-after-upserts / resurrection rules (SURVEY.md sec 3 EP3).
    */
  def userStateFused(events: DataFrame, batchSize: Long): DataFrame = {
    val typed = events.withColumn(
      "op",
      when(col("event_type") === "signup", OpInsert)
        .when(col("event_type") === "error", OpDelete)
        .otherwise(OpUpdate))
    val isUpsert = col("op") =!= OpDelete
    val isDelete = col("op") === OpDelete
    val batch = floor(col("event_id") / batchSize)

    val wRun = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("user_id"))

    typed
      .select(
        col("user_id"), col("event_id"), col("op"), col("ts"),
        sum(when(isUpsert, col("value"))).over(wRun).as("total_value"),
        count(when(isUpsert, lit(1))).over(wRun).as("n_events"),
        max(when(isUpsert, col("event_id"))).over(wAll).as("__lu"),
        max(when(isUpsert, batch)).over(wAll).as("__lub"),
        max(when(isDelete, batch)).over(wAll).as("__ldb"))
      .filter(
        col("event_id") === col("__lu") &&
          (col("__ldb").isNull || col("__lub") > col("__ldb")))
      .select(col("user_id"), col("ts").as("last_ts"),
        col("total_value"), col("n_events"))
  }
}
