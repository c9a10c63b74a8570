package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the memory/IO lever
  * for ANN at corpus scale: a 4-byte float becomes 1 byte, so a 100 TB
  * float corpus scans as ~25 TB, and the reconstruction error is bounded
  * by per-dimension ranges.
  *
  * Pipeline shape:
  *  1. [[dimStats]] — ONE combiner-backed aggregation for global
  *     per-dimension min/max (explode collapses to `dim` rows per mapper
  *     before the shuffle; the driver holds O(dim) doubles).
  *  2. [[quantize]] — pure scan: each value maps to round((v−min)/step),
  *     clamped to [0,255], stored −128..127 as `array<tinyint>`.
  *  3. [[dequantize]] / [[cosineQuantized]] — reconstruction and scoring
  *     are codegen'd column arithmetic; candidate scoring never touches
  *     float vectors, exact re-ranking (if wanted) reads floats only for
  *     the few finalists.
  *
  * All steps are deterministic — same corpus, same codes, any
  * partitioning.
  */
object Quantize {

  /** Per-dimension [min, max] over the whole corpus: explode → groupBy(dim)
    * with partial aggregation → collect O(dim). */
  def dimStats(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("__dim", "__v")))
      .groupBy(col("__dim"))
      .agg(min(col("__v").cast("double")).as("lo"),
        max(col("__v").cast("double")).as("hi"))
      .collect()
    val dim = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](dim)
    val hi = new Array[Double](dim)
    rows.foreach { r => lo(r.getInt(0)) = r.getDouble(1); hi(r.getInt(0)) = r.getDouble(2) }
    (lo, hi)
  }

  /** Quantization step per dimension; 0-width dimensions get step 1 so
    * they encode to a constant instead of dividing by zero. */
  private def steps(lo: Array[Double], hi: Array[Double]): Array[Double] =
    lo.indices.map { i =>
      val w = hi(i) - lo(i); if (w <= 0.0) 1.0 else w / 255.0
    }.toArray

  /** Encode `vecCol` to `array<tinyint>` codes (−128..127). The per-dim
    * constants inline as array literals — pure codegen'd scan. */
  def quantize(
      df: DataFrame, vecCol: String, lo: Array[Double], hi: Array[Double],
      outCol: String = "qcodes"): DataFrame = {
    val loLit = array(lo.map(lit(_)): _*)
    val stepLit = array(steps(lo, hi).map(lit(_)): _*)
    df.withColumn(outCol,
      zip_with(
        zip_with(col(vecCol).cast(ArrayType(DoubleType)), loLit,
          (v, l) => v - l),
        stepLit,
        (centered, s) =>
          (least(greatest(round(centered / s, 0), lit(0.0)), lit(255.0))
            - 128.0).cast(ByteType)))
  }

  /** Reconstruct approximate doubles from codes: v ≈ lo + (q+128)·step. */
  def dequantize(codes: Column, lo: Array[Double], hi: Array[Double]): Column = {
    val loLit = array(lo.map(lit(_)): _*)
    val stepLit = array(steps(lo, hi).map(lit(_)): _*)
    zip_with(
      zip_with(codes, stepLit, (q, s) => (q.cast(DoubleType) + 128.0) * s),
      loLit,
      (scaled, l) => scaled + l)
  }

  /** Cosine over two quantized code columns: ONE fused codegen'd loop
    * ([[graft.functions.QuantizedCosine]]) — dequantizes in-register, no
    * intermediate arrays, no float vectors read. Bit-identical to
    * [[cosineQuantizedHof]] (pinned in QuantizeSpec). */
  def cosineQuantized(
      a: Column, b: Column, lo: Array[Double], hi: Array[Double]): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.QuantizedCosine(
        org.apache.spark.sql.GraftColumnShim.expression(a),
        org.apache.spark.sql.GraftColumnShim.expression(b),
        lo.clone(), steps(lo, hi)))

  /** The compositional higher-order-function formulation of
    * [[cosineQuantized]] — kept as the executable specification the fused
    * expression is pinned against (it allocates ~7 arrays per scored
    * pair, so the hot path uses the fused kernel). */
  def cosineQuantizedHof(
      a: Column, b: Column, lo: Array[Double], hi: Array[Double]): Column =
    Similarity.cosine(dequantize(a, lo, hi), dequantize(b, lo, hi))

  /** Brute-force top-k over QUANTIZED codes: same probe shape as
    * [[Similarity.bruteForceTopK]] but the corpus side scans 1-byte codes.
    * At 100 TB this is the 4× scan-bytes reduction; recall vs float
    * cosine is pinned in QuantizeSpec. */
  def bruteForceTopKQuantized(
      corpus: DataFrame, queries: DataFrame, idCol: String, codesCol: String,
      lo: Array[Double], hi: Array[Double], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(codesCol).as("__qc"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(codesCol).as("__cc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineQuantized(col("__qc"), col("__cc"), lo, hi))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}
