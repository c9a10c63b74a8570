package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540, public): cluster the corpus with
  * a cheap coarse quantizer, then within each cluster drop documents
  * whose embedding cosine to another member exceeds a threshold. Catches
  * paraphrases and templated rewrites that lexical dedup (MinHash/SimHash
  * over tokens) misses.
  *
  * Scale shape, by stage:
  *  1. clustering reuses the IVF coarse quantizer
  *     ([[Similarity.ivfTrainAuto]] — bounded-sample k-means, flat cost in
  *     corpus size) and [[Similarity.withIvfList]] assignment — a pure
  *     scan with inlined centroid literals, NO shuffle, no model object;
  *  2. the ONLY shuffle is the within-cluster self-join on the cluster
  *     id. Pair count is Σ m_c², so `nLists` must scale with the corpus
  *     (the paper uses ~corpus/50k clusters at LAION scale) and
  *     `maxClusterSize` is the safety valve: clusters larger than the cap
  *     are SKIPPED (their members all survive) rather than exploding the
  *     join — the same conservative failure mode as the LSH
  *     `maxBucketSize` valve, losing recall never correctness;
  *  3. the survivor set is one LEFT ANTI join against the distinct
  *     dropped ids.
  *
  * Keep rule: within a cluster the LOWEST doc id of a duplicate pair
  * survives (the paper keeps the member closest to the centroid; min-id
  * is deterministic under any partitioning and independent of centroid
  * drift, which matters for reproducible corpus builds). The rule is
  * `dropped ⇔ ∃ lower-id member with cosine ≥ threshold`, so chains
  * collapse toward the oldest member.
  */
object SemDedup {

  /** Per-dropped-document report: which lower-id member it duplicates
    * (the smallest such id), how many lower-id near-dups it has, and the
    * strongest cosine. Deterministic; `round(…, 6)` on the emitted cosine
    * only (the threshold compares unrounded values). */
  def semDupReport(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      maxClusterSize: Int = 10000, pinAssigned: Boolean = false): DataFrame = {
    // `pinAssigned` (r18, guide §1.2/§5): the assigned frame feeds the
    // size valve, BOTH sides of the within-cluster self-join and (via
    // the report) the anti-join — four executions of the scan + the
    // argmin-over-centroids assignment expression per run. Batch-scale
    // callers ([[applyBatchIndexed]]) pin it so the assignment runs
    // once; the corpus-scale paths (semdedup_report over the whole
    // table) keep the default — checkpointing a full corpus's vectors
    // trades executor storage for a recompute that scans parquet anyway.
    val assigned0 = Similarity.withIvfList(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")),
      "__v", centroids, "__cluster")
    val assigned =
      if (pinAssigned) graft.ops.Checkpoints.pin(assigned0) else assigned0
    // the valve reads cluster sizes from a ≤ nLists-row aggregate joined
    // back broadcast — no window sort over the corpus
    val okClusters = assigned.groupBy(col("__cluster")).count()
      .filter(col("count") <= maxClusterSize)
      .select(col("__cluster").as("__cl_ok"))
    val sized = assigned
      .join(broadcast(okClusters), col("__cluster") === col("__cl_ok"), "left_semi")
    val lower = sized.select(col("__cluster").as("__cl2"),
      col("__id").as("__id_lo"), col("__v").as("__v_lo"))
    sized
      .join(lower, col("__cluster") === col("__cl2") &&
        col("__id_lo") < col("__id"))
      .withColumn("__cos", Similarity.cosine(col("__v"), col("__v_lo")))
      .filter(col("__cos") >= threshold)
      .groupBy(col("__id").as("dropped_id"))
      .agg(min(col("__id_lo")).as("kept_id"),
        count(lit(1)).as("n_lower_dups"),
        round(max(col("__cos")), 6).as("max_cosine"))
  }

  /** The corpus with semantic duplicates removed (all original columns
    * survive; only `dropped_id` rows leave). */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      maxClusterSize: Int = 10000, pinAssigned: Boolean = false): DataFrame = {
    val dropped = semDupReport(df, idCol, vecCol, centroids, threshold,
      maxClusterSize, pinAssigned).select(col("dropped_id"))
    df.join(dropped, col(idCol) === col("dropped_id"), "left_anti")
  }

  /** INCREMENTAL semantic dedup against a persistent [[IvfIndex]] — the
    * embedding-level twin of the text catalogs
    * ([[graft.streaming.StreamingNearDedup]] /
    * [[graft.dedup.ExactCatalog]]): the index holds the survivors'
    * vectors, each new batch dedups in-batch and then against the
    * indexed survivors, and the batch's own survivors grow the index.
    *
    * Semantics (survivor-catalog, arrival-order precedence — the same
    * contract as the text paths): a batch doc drops iff
    *  1. a LOWER-id batch member in its cluster has cosine ≥ threshold
    *     (the in-batch [[semDedup]] rule, under the INDEX's quantizer so
    *     clustering is consistent across batches), or
    *  2. ANY indexed survivor in its cluster has cosine ≥ threshold
    *     (the catalog wins regardless of id — it arrived first), or
    *  3. its id is already indexed (replay suppression: a re-run batch
    *     converges instead of re-admitting itself).
    *
    * Scale shape: stage 2 is the pruned probe — the vector scan carries
    * the batch's `list IN (…)` partition filter, so per-batch cost is
    * O(batch × probed-list occupancy), never O(index). No pair
    * explosion: the check is a batch×occupancy join with a per-row
    * cosine, not a self-join.
    *
    * Crash contract: `deliver` runs BEFORE the append (see
    * [[graft.dedup.ExactCatalog.applyBatch]] — appending first would
    * turn a crash into silent at-most-once loss). A replayed batch
    * re-admits exactly its not-yet-indexed survivors (in-batch
    * survivors mutually have cosine < threshold, so partially-appended
    * siblings cannot suppress them) and duplicate-appended vectors
    * collapse in [[IvfIndex.topK]]/[[IvfIndex.compact]].
    *
    * The index must exist — bootstrap by building it from the first
    * batch's [[semDedup]] survivors. */
  def applyBatchIndexed(
      batch: DataFrame, indexDir: String, idCol: String, vecCol: String,
      threshold: Double, maxClusterSize: Int = 10000,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val spark = batch.sparkSession
    val centroids = IvfIndex.readCentroids(spark, indexDir)
    // stage 1: in-batch dedup under the index's own quantizer; the
    // assignment is pinned (batch-scale — see semDupReport) so the
    // centroid argmin runs once, not once per self-join side
    val inBatch = graft.ops.Checkpoints.pin(
      semDedup(batch, idCol, vecCol, centroids, threshold, maxClusterSize,
        pinAssigned = true))
    // stage 2: the pruned catalog probe (one list per doc — the paper's
    // within-cluster rule, identical to stage 1's pairing scope)
    val q = graft.ops.Checkpoints.pin(Similarity.withIvfList(
      inBatch.select(col(idCol).cast(LongType).as("__qid"),
        col(vecCol).cast(ArrayType(DoubleType)).as("__qv")),
      "__qv", centroids, "list"))
    val probed = q.select(col("list")).distinct().collect().map(_.getInt(0))
    val dropped =
      if (probed.isEmpty) q.select(col("__qid")).limit(0)
      else IvfIndex.vectors(spark, indexDir)
        .filter(col("list").isin(probed.toSeq: _*))
        .join(broadcast(q), Seq("list"))
        .filter(col("id") === col("__qid") || // 3: replay suppression
          Similarity.cosine(col("__qv"), col("vec")) >= threshold) // 2
        .select(col("__qid")).distinct()
    val survivors = graft.ops.Checkpoints.pin(
      inBatch.join(dropped, col(idCol) === col("__qid"), "left_anti"))
    deliver(survivors) // delivery BEFORE the append — crash contract
    if (!survivors.isEmpty)
      IvfIndex.appendVectors(survivors, idCol, vecCol, indexDir)
    survivors
  }
}
