package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-quantization ANN — the third compression tier of the ANN stack
  * (float brute force → int8 scalar quantization → PQ): a D-dim float
  * vector (4·D bytes) becomes `m` bytes (e.g. 64-dim → 8 bytes, a 32×
  * reduction), so a 100 TB embedding corpus scans as ~3 TB of codes.
  *
  * Shape at scale:
  *  - TRAIN on a bounded driver-side sample per subspace (like
  *    [[Similarity.ivfTrain]] — the codebook is a sample statistic);
  *    m·k·dsub doubles broadcast to executors inside the expressions.
  *  - ENCODE is a pure scan ([[graft.functions.PqEncode]]), no shuffle.
  *  - SEARCH is ADC: the broadcast query side carries a precomputed
  *    lookup table ([[graft.functions.PqLut]]); scoring a corpus row is
  *    m table lookups ([[graft.functions.PqAdc]]) — no float vector is
  *    read at scan time. Optional exact re-rank reads float vectors for
  *    only the `rerank` finalists per query.
  *
  * Vectors are L2-normalized before train/encode, so the ADC inner
  * product approximates cosine. Deterministic: seeded sampling + Lloyd.
  */
object Pq {

  /** Trained codebooks: `m` subspaces × `k` centroids × `dsub` dims,
    * flattened (`sub*k*dsub + c*dsub + d`). */
  final case class PqModel(m: Int, k: Int, dsub: Int, cents: Array[Double])

  /** L2-normalize a vector column (zero vectors pass through as zeros). */
  def normalized(vec: Column): Column = {
    val v = vec.cast(ArrayType(DoubleType))
    val n = Similarity.norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** Train per-subspace codebooks on a bounded sample. `k ≤ 256` so a
    * code fits one byte. Dim must divide evenly into `m` subspaces.
    *
    * NO pre-count: a `count()` solely to size a sample fraction is one
    * gratuitous full corpus pass at 100 TB. The `limit` bounds the read
    * (Spark stops scanning once satisfied) and the driver collect alike;
    * callers that want a UNIFORM sample at known scale pass
    * `sampleFraction` (like [[Similarity.ivfTrain]]) and the limit
    * becomes the safety valve.
    *
    * BIAS CAVEAT of the default (no `sampleFraction`) path: on a corpus
    * larger than `targetRows`, `limit` keeps whatever rows Spark scans
    * FIRST — so the training set follows partition order, and on data
    * sorted or clustered by source the codebook is trained on a biased
    * slice (and changes when the partitioning changes; only the
    * in-sample ordering is canonicalized by the sort below). Acceptable
    * for codebooks over well-shuffled corpora; on clustered data pass a
    * `sampleFraction` sized from catalog stats to sample uniformly. */
  def train(
      corpus: DataFrame, vecCol: String, m: Int, k: Int,
      targetRows: Long = 20000L, seed: Long = 42L,
      sampleFraction: Option[Double] = None,
      // false when the input column is ALREADY in code space (e.g. the
      // IVF-PQ residuals v̂ − ĉ_list — re-normalizing a residual would
      // destroy the linear dot decomposition the ADC bias relies on)
      normalize: Boolean = true): PqModel = {
    require(k > 1 && k <= 256, s"k must be in (1, 256]: $k")
    val base = sampleFraction match {
      case Some(f) if f < 1.0 => corpus.sample(f, seed)
      case _ => corpus
    }
    val collected = base
      .select(if (normalize) normalized(col(vecCol))
        else col(vecCol).cast(ArrayType(DoubleType)))
      .limit(math.min(targetRows, Similarity.MaxTrainRows).toInt)
      .collect().map(_.getSeq[Double](0).toArray)
    require(collected.nonEmpty, "cannot train PQ on an empty corpus")
    // collect() order follows partitioning; Lloyd's seeded init is order-
    // sensitive — sort lexicographically so the codebook is a pure
    // function of the sampled SET (deterministic across partitionings)
    val sample = collected.sortWith { (a, b) =>
      var i = 0
      while (i < a.length && i < b.length && a(i) == b(i)) i += 1
      if (i < a.length && i < b.length) a(i) < b(i) else a.length < b.length
    }
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val cents = new Array[Double](m * k * dsub)
    var sub = 0
    while (sub < m) {
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      val cs = Similarity.lloyd(pts, k, iters = 10, seed + sub)
      var c = 0
      while (c < k) {
        System.arraycopy(cs(c), 0, cents, sub * k * dsub + c * dsub, dsub)
        c += 1
      }
      sub += 1
    }
    PqModel(m, k, dsub, cents)
  }

  /** Append the m-byte PQ code column — pure codegen'd scan. */
  def encode(df: DataFrame, vecCol: String, model: PqModel,
      outCol: String = "pq_codes"): DataFrame =
    df.withColumn(outCol,
      org.apache.spark.sql.GraftColumnShim.column(
        graft.functions.PqEncode(
          org.apache.spark.sql.GraftColumnShim.expression(normalized(col(vecCol))),
          model.cents, model.m, model.k, model.dsub)))

  /** ADC top-k: corpus scans CODES only; queries broadcast with their
    * lookup tables. `rerank > k` re-ranks that many ADC finalists per
    * query with exact float cosine (reads float vectors for finalists
    * only); `rerank = 0` returns raw ADC ranking with the approximate
    * score. */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, model: PqModel, k: Int,
      rerank: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shim = org.apache.spark.sql.GraftColumnShim
    val c = encode(corpus, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("pq_codes"))
    val q = queries.select(col(idCol).as("query_id"),
      shim.column(graft.functions.PqLut(
        shim.expression(normalized(col(vecCol))),
        model.cents, model.m, model.k, model.dsub)).as("__lut"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", shim.column(graft.functions.PqAdc(
        shim.expression(col("pq_codes")), shim.expression(col("__lut")), model.k)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val ranked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0)
      ranked.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("adc"), 6).as("adc"))
    else {
      val shortlist = ranked.filter(col("rank") <= math.max(k, rerank))
        .select(col("query_id"), col("neighbor_id"))
      val qVecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      val cVecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      val exact = shortlist
        .join(broadcast(qVecs), Seq("query_id"))
        .join(cVecs, Seq("neighbor_id"))
        .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      exact.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
    }
  }
}
