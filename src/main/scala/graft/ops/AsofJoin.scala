package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row with
  * `right.time <= left.time` within the same key — the point-in-time
  * lookup every event/state analysis needs (the TOAST backward-fill, D4,
  * is a special case). Spark has no native ASOF JOIN; the naive encodings
  * are a range join (quadratic blowup per key) or a per-key loop.
  *
  * This implementation is ONE shuffle: both sides union into a single
  * keyed timeline, a window partitioned by key and ordered by
  * (time, side, tiebreak) carries the right side's row — as ONE struct,
  * so multi-column matches stay atomic — forward with
  * `last(_, ignoreNulls = true)`, and left rows surface with the carried
  * values attached. Cost is a sort within each key partition, the same
  * shape as any windowed aggregation: no join explosion, skew handled by
  * AQE like any single-key shuffle.
  *
  * Ties: a right row AT the left row's timestamp matches (`<=`, the ASOF
  * convention); among right rows sharing (key, time) the last by
  * `rightOrder` wins — pass a deterministic tiebreaker for exact
  * reproducibility.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightValueCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.exists(leftCols.contains),
      "right value columns must not collide with left columns")

    // one tagged timeline; right rows sort BEFORE left rows at equal time
    // so an exact-time match is visible to the left row's frame
    val l = left.select(
      leftCols.map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightValueCols.map(c => right.schema(c).copy(nullable = true)))).as("__rv") :+
        lit(1).as("__side") :+ lit(0L).as("__ro"): _*)
    val r = right.select(
      leftCols.map(c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(col): _*).as("__rv") :+
        lit(0).as("__side") :+
        rightOrder.map(col(_).cast("long")).getOrElse(lit(0L)).as("__ro"): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__ro"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValueCols.map(c => col(s"__last_rv.$c").as(c)): _*)
  }
}
