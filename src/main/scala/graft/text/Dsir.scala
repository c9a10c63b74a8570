package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-unigram
  * distribution looks like a small trusted TARGET corpus. Each word
  * hashes into one of `buckets` feature buckets; a bucket's importance
  * is the smoothed log-ratio of its target vs raw probability, and a
  * document's weight is the sum of its tokens' bucket importances.
  *
  * 100 TB shape: feature estimation is ONE combiner-backed aggregation
  * per corpus (explode collapses to ≤ `buckets` rows per mapper before
  * the exchange), the ratio table is dense and tiny (`buckets` rows —
  * 10k by default, broadcast), and scoring is one scan + one shuffle on
  * the doc id with map-side partial sums. Selection is a global top-k
  * (TakeOrdered — never a full sort materialization). Nothing driver-side
  * grows with the corpus.
  *
  * Determinism: per-bucket log-ratios are rounded to 6 dp and summed as
  * DECIMAL, so document weights are exact integers of 1e-6 — independent
  * of partitioning, accumulation order, and engine (`ln` differs across
  * libms only in the last ulp, orders of magnitude below the rounding).
  * That makes every output here hash-exact against a DuckDB oracle.
  */
object Dsir {

  /** The paper uses 10k hashed buckets for unigram features. */
  val DefaultBuckets = 10000

  private def tokens(text: Column): Column = GraftFunctions.tokenizeWs(text)

  /** word → feature bucket: the SQL-portable base-31 rolling fingerprint
    * (same as [[GraftFunctions.fingerprint64]], oracle-proven by the
    * `doc_fingerprint` gate query), folded into [0, buckets). */
  private def bucketOf(word: Column, buckets: Int): Column =
    GraftFunctions.fingerprint64(word) % buckets

  /** Hashed-unigram counts: (bucket, n) with ≤ `buckets` rows. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int = DefaultBuckets): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .select(bucketOf(col("w"), buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** DENSE per-bucket importance table: every bucket in [0, buckets) gets
    * `lr = round(ln((n_t+1)/(N_t+B)) - ln((n_r+1)/(N_r+B)), 6)` with
    * add-one smoothing — dense so scoring any future document (including
    * words unseen at estimation time) is a plain inner join. Token totals
    * are re-aggregated from the count tables (≤ B rows), not a second
    * corpus pass. */
  def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val spark = raw.sparkSession
    // the count tables feed BOTH the bucket join and the totals — without
    // materialization each consumer re-aggregates the corpus, i.e. a
    // second full scan per split at 100 TB. Checkpoints.pin keeps the
    // ≤ `buckets` rows once (ContextCleaner reclaims the blocks when the
    // plan is collected; cache() would leak — see minhashCandidatePairs)
    val rb = graft.ops.Checkpoints.pin(bucketCounts(raw, textCol, buckets))
    val tb = graft.ops.Checkpoints.pin(bucketCounts(target, textCol, buckets))
    val totals = rb.agg(coalesce(sum(col("n")), lit(0L)).as("n_raw"))
      .crossJoin(tb.agg(coalesce(sum(col("n")), lit(0L)).as("n_tgt")))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(rb.withColumnRenamed("n", "rn"), Seq("bucket"), "left")
      .join(tb.withColumnRenamed("n", "tn"), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((coalesce(col("tn"), lit(0L)) + 1).cast("double") /
            (col("n_tgt") + buckets).cast("double")) -
          log((coalesce(col("rn"), lit(0L)) + 1).cast("double") /
            (col("n_raw") + buckets).cast("double")), 6).as("lr"))
  }

  /** Per-document importance weight: Σ over tokens of the token's bucket
    * log-ratio, summed exactly (decimal) — see class note. Documents with
    * zero tokens produce no row (they carry no evidence either way). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), bucketOf(col("w"), buckets).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("lr").cast("decimal(18,6)")).cast("double").as("dsir_weight"))

  /** End-to-end selection: estimate ratios from (raw, target), score raw,
    * keep the k docs most target-like. Rounded weights tie-break on the
    * id, so the cut is total-ordered and engine-independent. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = DefaultBuckets): DataFrame = {
    val ratios = logRatios(raw, target, textCol, buckets)
    importanceWeights(raw, idCol, textCol, ratios, buckets)
      .orderBy(col("dsir_weight").desc, col(idCol))
      .limit(k)
  }
}
