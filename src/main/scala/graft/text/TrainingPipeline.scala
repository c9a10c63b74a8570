package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The composed training-data curation pipeline — the end-to-end use case
  * the individual operators exist for: exact dedup, then language filter,
  * then quality filter, emitting per-doc stats for the survivors.
  *
  * Plan shape: the scalar stages (langId, quality, token count) fuse into
  * the dedup scan's projection — the whole pipeline is ONE shuffle (the
  * dedup fingerprint groupBy); filters run before the shuffle so
  * low-quality/wrong-language rows never shuffle at all when
  * `filtersFirst` (the default, correct because exact dedup keeps the
  * min-id row and identical texts score identically — filtering commutes
  * with dedup).
  */
object TrainingPipeline {

  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      filtersFirst: Boolean = true): DataFrame = {
    val text = col(textCol)
    def passes(df: DataFrame): DataFrame = df
      .filter(TextOps.langId(text) === lang)
      .filter(TextOps.qualityScore(text) >= minQuality)
    val filtered = if (filtersFirst) passes(docs) else docs
    val deduped = Dedup.dedupExact(filtered, idCol, textCol)
    val survivors = if (filtersFirst) deduped else passes(deduped)
    survivors.select(
      col(idCol),
      TextOps.tokenCount(text).as("n_tokens"),
      TextOps.qualityScore(text).as("quality"),
      TextOps.langId(text).as("lang_pred"))
  }

  /** Corpus-level stats of a curated set (one aggregation). */
  def stats(curated: DataFrame): DataFrame =
    curated.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      round(avg(col("quality")), 6).as("avg_quality"))

  /** Streaming curation: the same filter chain as [[curate]] applied to an
    * unbounded document stream, with exact dedup held in keyed streaming
    * state ([[graft.streaming.StatefulOps.dedupStream]] — 8-byte content
    * hashes per distinct doc, never texts). A doc is emitted at its FIRST
    * arrival if it passes the language/quality gates; later identical
    * arrivals drop, across micro-batches, forever.
    *
    * Filters run BEFORE the stateful dedup, so rejected docs never touch
    * the state store — state grows with the curated rate, not the ingest
    * rate. Emits the same per-doc stat columns as [[curate]]. */
  def curateStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.Encoders
    val text = col(textCol)
    val filtered = docs
      .filter(TextOps.langId(text) === lang)
      .filter(TextOps.qualityScore(text) >= minQuality)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.GraftFunctions.fingerprint64(text).as("fp"),
        text.as("text"))
      .as(Encoders.product[graft.streaming.SeenDoc])
    graft.streaming.StatefulOps.dedupStream(filtered)
      .toDF()
      .select(col("doc_id").as(idCol),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.langId(col("text")).as("lang_pred"))
  }

  /** The full curation chain including near-dedup: filters + exact dedup
    * ([[curate]]), then MinHash+LSH candidate pairs resolved into
    * clusters with one canonical survivor each ([[Dedup
    * .dedupNearByClusters]]). Near-dedup runs LAST, on the already-curated
    * (smallest) set — candidate generation cost scales with what
    * survived, not the raw corpus. */
  def curateWithNearDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.5,
      jaccardThreshold: Double = 0.8): DataFrame = {
    val curated = curate(docs, idCol, textCol, lang, minQuality)
    val survivingDocs = docs.join(curated.select(idCol), Seq(idCol), "left_semi")
    val pairs = Dedup.minhashCandidatePairs(
      survivingDocs, idCol, textCol, jaccardThreshold = jaccardThreshold)
    curated.join(
      Dedup.dedupNearByClusters(survivingDocs.select(idCol), idCol, pairs),
      Seq(idCol), "left_semi")
  }
}
