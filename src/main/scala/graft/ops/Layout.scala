package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DATA-LAYOUT operators — how a 100 TB table is arranged on disk so
  * scans prune instead of read. A single-column sort gives row-group
  * min/max skipping on one predicate axis; Z-ORDERING interleaves two
  * axes into one Morton key ([[graft.functions.ZOrderKernels]]) so a
  * sort by the key clusters BOTH — a 2-D box predicate then skips the
  * row groups outside its quadrants (the Delta/Iceberg OPTIMIZE ZORDER
  * move, restated as plain DataFrame ops: one range exchange + in-
  * partition sort, no driver work, no extra shuffle beyond what any
  * global layout costs).
  *
  * Coordinates must be non-negative 31-bit ints (the key stays a
  * non-negative signed long — see [[graft.functions.InterleaveBits]]);
  * real domains (timestamps, doubles, ids) should be rank- or
  * range-bucketed into that range first — [[bucket31]] below for the
  * linear case. Rows with an out-of-range/null coordinate get a NULL
  * key and range-sort to one end, never silently scrambled into the
  * curve.
  */
object Layout {

  /** The Morton key column of two 31-bit coordinates. */
  def zorderKey(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.interleaveBits(
      a.cast("long"), b.cast("long"))

  /** Linear bucketing of a numeric column into [0, buckets) for the
    * z-key: `floor((v - lo) / (hi - lo) * buckets)`, clamped. The
    * SIMPLE scaler for roughly-uniform domains; skewed domains want a
    * rank bucketing (ntile) upstream. */
  def bucket31(v: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(buckets > 0 && buckets.toLong <= (1L << 31) - 1,
      s"buckets out of 31-bit range: $buckets")
    require(hi > lo, s"degenerate range [$lo, $hi]")
    least(greatest(
      floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets))
        .cast("long"),
      lit(0L)), lit(buckets.toLong - 1L))
  }

  /** Re-layout `df` along the z-curve of `(a, b)`: one range exchange
    * on the Morton key + an in-partition sort, so every output file
    * covers a compact curve segment (tight min/max stats on BOTH
    * source columns). Write the result with plain `.write.parquet` —
    * the sort survives the file writer because the partitioner IS the
    * sort order (no extra Sort node is planned). `numFiles` sizes the
    * range exchange; at cluster scale pick it from the target file
    * size, not the executor count. */
  def zorderBy(df: DataFrame, a: Column, b: Column,
      numFiles: Int = 0): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKey(a, b))
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    ranged.sortWithinPartitions(col("__zkey")).drop("__zkey")
  }
}
