package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnShim.{column, expression}

/** Image deduplication for multimodal training-data pipelines — the
  * LAION/DataComp-style move: a 100 TB multimodal crawl dedups images
  * BEFORE anything else. Two tiers, mirroring the text family's shapes:
  *
  *  - **byte-exact**: one hash-shuffle on `xxhash64(payload)` (8 bytes,
  *    never the payload); byte equality is only re-checked within the
  *    tiny hash-collision groups — the [[Dedup.dedupExact]] discipline
  *    over binary.
  *  - **perceptual near-dup**: one REAL pixel decode per image computes a
  *    64-bit pHash ([[graft.functions.ImageKernels.phash64]] — DCT sign
  *    pattern of the 32×32 luma); candidates are Hamming-blocked by
  *    16-bit quarters (identical-quarter pigeonhole: distance ≤ 3 ⇒ some
  *    quarter matches — the [[Dedup.simhashCandidatePairs]] precedent),
  *    so candidate generation is ONE shuffle and never goes quadratic.
  *    Everything downstream of the decode moves 8-byte longs.
  */
object ImageDedup {

  /** Quarter-blocking recall guarantee: 4 blocks of 16 bits cover
    * Hamming ≤ 3 by pigeonhole. Callers needing a looser radius must
    * re-block (8×8-bit blocks cover ≤ 7 at ~256× the candidate volume). */
  val MaxBlockedHamming = 3

  /** Independent second hash over the payload bytes for the exact tier's
    * collision re-check (different xxhash64 seed — a false drop needs a
    * simultaneous two-seed collision; carrying payloads in a catalog
    * would not be a catalog). */
  def binaryH2(c: Column): Column =
    column(new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(expression(c)), 0x9e3779b97f4a7c15L))

  def withPHash(df: DataFrame, binCol: String, out: String = "phash"): DataFrame =
    df.withColumn(out, graft.functions.GraftFunctions.imagePHash(col(binCol)))

  def withDHash(df: DataFrame, binCol: String, out: String = "dhash"): DataFrame =
    df.withColumn(out, graft.functions.GraftFunctions.imageDHash(col(binCol)))

  // ------------------------------------------------------------- exact

  /** Byte-exact duplicate groups: (canonical id = min id, n_dups) per
    * distinct payload. Null payloads are excluded (an absent image is
    * not a duplicate of another absent image). */
  def exactDupGroups(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.filter(col(binCol).isNotNull)
      .select(col(idCol), col(binCol), xxhash64(col(binCol)).as("__fp"))
      .groupBy(col("__fp"), col(binCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))
      .select(col("canonical_id"), col("n_dups"))

  /** Keep only the min-id row per identical payload; null-payload rows
    * survive untouched. */
  def dedupExactBinary(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val w = Window
      .partitionBy(xxhash64(col(binCol)), col(binCol))
      .orderBy(col(idCol))
    df.filter(col(binCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .unionByName(df.filter(col(binCol).isNull))
  }

  // ----------------------------------------------------------- near-dup

  /** The 4 blocking keys of a 64-bit perceptual hash, encoded as
    * `(quarter index << 16) | quarter value` — 18-bit longs that double
    * as the catalog's pruning fingerprints ([[ImageCatalog]]). */
  def quarterKeys(hash: Column): Column =
    array((0 until 4).map(q =>
      (lit(q.toLong * 65536L) +
        shiftright(hash, q * 16).bitwiseAND(lit(0xffffL)))): _*)

  /** Near-duplicate candidate pairs by pHash quarter blocking + Hamming
    * filter over an already-computed `(id, phash)` frame (the seam that
    * lets one decode pass feed probe, pairs and catalog append — decode
    * is the dominant cost here, ~10⁴× the hash joins). Same one-shuffle
    * bucket-explode shape as [[Dedup.simhashCandidatePairs]] and (with
    * an array payload) [[VideoDedup.videoCandidatePairs]] — a
    * blocking-shape fix must land in all three. No bucket valve here:
    * an identical pHash IS an actual near-dup, so hot buckets are
    * genuine duplicate mass, not logo-style coincidence. */
  def phashCandidatePairsFromHashes(
      hashed: DataFrame, maxHamming: Int = MaxBlockedHamming): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxBlockedHamming,
      s"quarter blocking guarantees recall only to Hamming $MaxBlockedHamming; got $maxHamming")
    val banded = hashed.filter(col("phash").isNotNull)
      .select(explode(quarterKeys(col("phash"))).as("qkey"),
        struct(col("id"), col("phash")).as("m"))
    banded
      .groupBy(col("qkey"))
      .agg(collect_list(col("m")).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(filter(
        flatten(transform(col("members"), a =>
          transform(col("members"), b => struct(
            a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            a.getField("phash").as("ph_a"), b.getField("phash").as("ph_b"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.ph_a").as("ph_a"), col("p.ph_b").as("ph_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Candidate pairs from raw payloads: decode once, then block. */
  def phashCandidatePairs(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = MaxBlockedHamming): DataFrame =
    phashCandidatePairsFromHashes(
      graft.ops.Checkpoints.pin(
        withPHash(df, binCol).select(col(idCol).as("id"), col("phash"))),
      maxHamming)

  /** Full in-corpus perceptual dedup: candidate pairs → connected
    * components → keep the min-id image per cluster; undecodable-payload
    * rows survive (they are input for other quality filters, not dups). */
  def dedupNearImages(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = MaxBlockedHamming): DataFrame =
    Dedup.dedupNearByClusters(df, idCol,
      phashCandidatePairs(df, idCol, binCol, maxHamming))
}
