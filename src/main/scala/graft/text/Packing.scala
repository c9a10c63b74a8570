package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and token-budgeted selection — the planning ops that
  * turn a curated corpus into training batches.
  *
  * The reference engine (myyrakle/clockpipe) stops at row delivery; these
  * are the extensions a pretraining pipeline needs on top: concat-and-chunk
  * packing (every efficient trainer packs documents into fixed-length
  * sequences) and quality-ranked selection under a token budget (the DCLM /
  * FineWeb move: rank by a quality signal, take documents until the token
  * budget is spent).
  */
object Packing {

  /** Concat-and-chunk packing plan: documents are concatenated per source
    * in id order and cut into `tokenBudget`-token packs; each doc is
    * assigned the pack where it STARTS (`pack_id`) and its token offset in
    * that pack (`pack_offset`). Pure integer math over one running sum —
    * deterministic and exactly reproducible.
    *
    * Scale: one shuffle on the source key; the running sum within a source
    * is inherently sequential (that IS the semantics — packs are defined by
    * concatenation order), so a single gigantic source serializes. At 100 TB
    * shard first and plan per (source, shard) — [[packPlanSharded]] keeps
    * pack ids globally unique with a tiny per-shard base-offset join. */
  def packPlan(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      tokenBudget: Int): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    docs.select(col(sourceCol), col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(sourceCol), col(idCol), col("n_tokens"),
        expr(s"__cum_before DIV $tokenBudget").as("pack_id"),
        (col("__cum_before") % tokenBudget).as("pack_offset"))
  }

  /** Sharded packing for the 100 TB shape: docs hash into `nShards`
    * independent sub-streams per source, each packed locally in parallel;
    * local pack ids are then offset by the total pack count of the
    * preceding shards (an O(sources × shards) aggregate, broadcast back).
    * Same output columns as [[packPlan]] plus `shard`; pack ids stay
    * disjoint across shards within a source. */
  def packPlanSharded(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      tokenBudget: Int, nShards: Int,
      // shard assignment, overridable: the default xxhash64 split is the
      // production choice; callers needing a PORTABLE assignment (the
      // oracle restates the pipeline in DuckDB, which has no xxhash64)
      // pass their own expression, which must land in [0, nShards)
      shardBy: Option[Column] = None): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sharded = docs.withColumn("shard",
      shardBy.getOrElse(pmod(xxhash64(col(idCol)), lit(nShards))))
    val w = Window.partitionBy(col(sourceCol), col("shard")).orderBy(col(idCol))
    val local = sharded.select(col(sourceCol), col("shard"), col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("__local_pack", expr(s"__cum_before DIV $tokenBudget"))
      .withColumn("pack_offset", col("__cum_before") % tokenBudget)
    // per-(source, shard) pack counts → running base offset over shards.
    // A shard OCCUPIES ceil(total_tokens / budget) packs — NOT
    // max(start pack) + 1: a last doc that spans past its start pack
    // overflows into packs no shard-local doc STARTS in, and basing the
    // next shard on started packs would alias its pack ids onto windows
    // still holding the previous shard's tail tokens. The max(start)+1
    // term still participates under greatest(): a trailing ZERO-token doc
    // sitting exactly on a pack boundary (or an all-empty shard) starts a
    // pack that holds no tokens, so ceil alone would hand its pack_id to
    // the next shard — pack ids must stay disjoint even for empty docs.
    val wb = Window.partitionBy(col(sourceCol)).orderBy(col("shard"))
    val bases = local.groupBy(col(sourceCol), col("shard"))
      .agg(greatest(
        expr(s"(sum(n_tokens) + $tokenBudget - 1) DIV $tokenBudget"),
        max(col("__local_pack")) + lit(1L)).as("__n_packs"))
      .withColumn("__base", sum(col("__n_packs")).over(wb) - col("__n_packs"))
      .select(col(sourceCol), col("shard"), col("__base"))
    local.join(broadcast(bases), Seq(sourceCol, "shard"))
      .select(col(sourceCol), col("shard"), col(idCol), col("n_tokens"),
        (col("__base") + col("__local_pack")).as("pack_id"), col("pack_offset"))
  }

  /** Quality-ranked selection under a per-source token budget: rank docs by
    * (quality desc, id asc) within each source and keep the prefix whose
    * cumulative token count stays ≤ `tokenBudget`. The ranking signal is
    * [[TextOps.qualityScore]] (rounded to 6 dp, so ordering is stable and
    * portable); the budget test uses the cumulative sum INCLUDING the
    * current doc, and since the running sum is monotone the result is a
    * strict prefix of the ranking — the reproducible contract trainers
    * want (no later small doc sneaks back in past an overflowing one).
    *
    * One shuffle on the source key; integer running sum, no floats in the
    * keep decision beyond the stable rounded quality ordering. */
  def selectUnderTokenBudget(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality").desc, col(idCol))
    docs.select(col(sourceCol), col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextOps.qualityScore(col(textCol)).as("quality"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .filter(col("__cum") <= tokenBudget)
      .select(col(sourceCol), col(idCol), col("n_tokens"), col("quality"))
  }
}
