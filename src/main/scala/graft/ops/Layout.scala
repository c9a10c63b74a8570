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

  /** The k-dim Morton key (3 or 4 coordinates; widths 21/15 bits per
    * dim — [[graft.functions.ZOrderKernels.bitsForDims]]). Two
    * coordinates should use [[zorderKey]] (cheaper magic-mask spread). */
  def zorderKeyN(cols: Seq[Column]): Column =
    graft.functions.GraftFunctions.interleaveBitsK(cols.map(_.cast("long")))

  /** Linear bucketing of a numeric column into [0, buckets) for the
    * z-key: `floor((v - lo) / (hi - lo) * buckets)`, clamped. The
    * SIMPLE scaler for roughly-uniform domains; skewed domains want the
    * RANK bucketing below ([[rankBucket]] exact at gate scale,
    * [[quantileBounds]] + [[bucketByBounds]] at cluster scale). */
  def bucket31(v: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(buckets > 0 && buckets.toLong <= (1L << 31) - 1,
      s"buckets out of 31-bit range: $buckets")
    require(hi > lo, s"degenerate range [$lo, $hi]")
    least(greatest(
      floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets))
        .cast("long"),
      lit(0L)), lit(buckets.toLong - 1L))
  }

  /** EXACT rank bucketing into [0, buckets): `ntile(buckets) − 1` over a
    * global order — equal-population buckets regardless of skew, the
    * helper the [[bucket31]] scaladoc promised. `tieBreak` must make the
    * order total (ntile splits tie runs at bucket edges; an ambiguous
    * order would make the layout nondeterministic). CAVEAT, stated
    * plainly: a global window means ONE partition holds the sort — fine
    * for gate/medium-scale layouts, wrong at 100 TB, where the
    * [[quantileBounds]] + [[bucketByBounds]] pair below computes the
    * same equal-population intent from a one-pass mergeable quantile
    * sketch with no global sort. */
  def rankBucket(v: Column, tieBreak: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    import org.apache.spark.sql.expressions.Window
    ntile(buckets).over(Window.orderBy(v, tieBreak)).cast("long") - 1L
  }

  /** Inner quantile boundaries of `colName` — `buckets − 1` values at
    * q = i/buckets — for [[bucketByBounds]]. `exact = true` uses the
    * exact `percentile` aggregate (memory O(distinct values) on one
    * executor — the oracle-friendly path); `false` uses
    * `percentile_approx` (mergeable sketch, one scan, the 100 TB path:
    * boundary error moves a few rows between adjacent buckets, never
    * breaks ordering). Driver-small result: buckets − 1 doubles. */
  def quantileBounds(df: DataFrame, colName: String, buckets: Int,
      exact: Boolean = false): Array[Double] = {
    require(buckets > 1, s"buckets must be > 1: $buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val fn = if (exact) "percentile" else "percentile_approx"
    // cast to double INSIDE the aggregate: percentile_approx preserves
    // an integral input type and would hand back longs
    val row = df.selectExpr(
      s"$fn(CAST($colName AS DOUBLE), array(${qs.mkString(", ")})) AS bs")
      .head
    // percentile over zero rows aggregates to NULL — surface a clear
    // error instead of the opaque NPE the Seq accessor would throw
    require(!row.isNullAt(0),
      s"quantileBounds: no non-null '$colName' values to bucket")
    row.getSeq[Double](0).toArray
  }

  /** Bucket of `v` against sorted `bounds`: the count of boundaries
    * ≤ v (a codegen'd binary search —
    * [[graft.functions.BucketByBounds]]), so bucket i holds
    * `(bounds(i−1), bounds(i)]`-ish populations. NULL in → NULL out. */
  def bucketByBounds(v: Column, bounds: Array[Double]): Column =
    graft.functions.GraftFunctions.bucketByBounds(v.cast("double"), bounds)

  /** Re-layout `df` along the z-curve of `(a, b)`: one range exchange
    * on the Morton key + an in-partition sort, so every output file
    * covers a compact curve segment (tight min/max stats on BOTH
    * source columns). Write the result with plain `.write.parquet` —
    * the sort survives the file writer because the partitioner IS the
    * sort order (no extra Sort node is planned). `numFiles` sizes the
    * range exchange; at cluster scale pick it from the target file
    * size, not the executor count. */
  def zorderBy(df: DataFrame, a: Column, b: Column,
      numFiles: Int = 0): DataFrame =
    zorderByKey(df, zorderKey(a, b), numFiles)

  /** [[zorderBy]] for 3–4 coordinates ([[zorderKeyN]] widths). */
  def zorderByN(df: DataFrame, cols: Seq[Column],
      numFiles: Int = 0): DataFrame =
    zorderByKey(df, zorderKeyN(cols), numFiles)

  /** Write `df` BUCKETED by `key` into the session catalog as
    * `tableName` — the co-location move for keys that are joined or
    * aggregated repeatedly: hash-bucketed files carry
    * `HashPartitioning(key, buckets)` as their scan-time output
    * partitioning, so every later equi-join or aggregation on `key`
    * (against another table bucketed to the SAME count, or a repeated
    * self-read) plans with ZERO shuffle exchanges — one layout shuffle
    * at write time amortized across every downstream read. `sortBy` the
    * same key so in-bucket files are merge-join-ready without a sort.
    *
    * 100 TB guidance: pick `buckets` from the target in-bucket file
    * size (total size / bucket count per partition), not the executor
    * count — buckets are the JOIN parallelism for every consumer; the
    * reference pipelines' fact tables (events by user, lineitem by
    * order) want thousands. Bucket counts must MATCH across the tables
    * to be co-joined (Spark only recognizes equal counts). LayoutSpec
    * pins the zero-exchange plan; the BENCH pair
    * `join_colocated`/`join_shuffled` prices it. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)
  }

  private def zorderByKey(df: DataFrame, key: Column,
      numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", key)
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    ranged.sortWithinPartitions(col("__zkey")).drop("__zkey")
  }
}
