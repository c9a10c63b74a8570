package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Video deduplication — the third media leg: a video's fingerprint is
  * its evenly-sampled FRAME-HASH sequence
  * ([[graft.functions.VideoKernels.framePhashes]] — real AVI/RIFF
  * container walk + real per-frame pixel decode), and two videos are
  * near-duplicates when their aligned frame hashes all sit within the
  * blocking radius. Candidate generation blocks on the FIRST sampled
  * frame's 16-bit quarters (one shuffle): near-dup videos have
  * near-dup first frames, so the image tier's pigeonhole guarantee
  * (Hamming ≤ 3 ⇒ a shared quarter) carries over; the aligned
  * max-per-frame Hamming filter then confirms per candidate pair.
  */
object VideoDedup {

  val DefaultSampledFrames = 4

  def withFramePhashes(df: DataFrame, binCol: String,
      n: Int = DefaultSampledFrames, out: String = "frame_phashes"): DataFrame =
    df.withColumn(out,
      graft.functions.GraftFunctions.videoFramePhashes(col(binCol), n))

  /** Max per-frame Hamming distance between two aligned frame-hash
    * arrays (null when lengths differ — different sampling is a
    * different fingerprint universe). */
  def alignedMaxHamming(a: Column, b: Column): Column =
    when(size(a) === size(b),
      array_max(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)))))

  /** Near-duplicate candidate pairs: first-frame quarter blocking →
    * aligned max-Hamming filter. One bucket-explode shuffle, pairs carry
    * ids + frame arrays (small: n longs each). Same one-shuffle shape as
    * [[ImageDedup.phashCandidatePairsFromHashes]] with an array payload
    * and an aligned compare — kept side by side rather than generalized
    * so each modality's payload/compare stays readable; a blocking-shape
    * fix must land in both (cross-referenced in both scaladocs).
    *
    * `maxBucketSize` (0 = unlimited): unlike images — where an identical
    * hash means an actual near-dup — many DISTINCT videos legitimately
    * share a first frame (black lead-ins, studio logos), and such a hot
    * bucket goes quadratic in the in-place pair explode. Oversized
    * buckets are dropped (standard LSH hygiene, the
    * [[Dedup.minhashCandidatePairs]] valve); callers needing recall on
    * logo-fronted corpora should sample more frames and block on a
    * middle frame instead. */
  def videoCandidatePairs(
      df: DataFrame, idCol: String, binCol: String,
      n: Int = DefaultSampledFrames,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      maxBucketSize: Int = 4096): DataFrame =
    videoCandidatePairsFromHashes(
      graft.ops.Checkpoints.pin(
        withFramePhashes(df.select(col(idCol), col(binCol)), binCol, n)
          .select(col(idCol).as("id"), col("frame_phashes"))),
      maxHamming, maxBucketSize)

  /** [[videoCandidatePairs]] over an already-computed
    * `(id, frame_phashes)` frame — the seam that lets one decode pass
    * feed probe, in-batch pairs and catalog append
    * ([[VideoCatalog.applyBatch]]; the
    * [[ImageDedup.phashCandidatePairsFromHashes]] precedent). */
  def videoCandidatePairsFromHashes(
      hashed: DataFrame,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      maxBucketSize: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= ImageDedup.MaxBlockedHamming,
      s"quarter blocking guarantees recall only to Hamming " +
        s"${ImageDedup.MaxBlockedHamming}; got $maxHamming")
    val banded = hashed.filter(col("frame_phashes").isNotNull).select(
      explode(ImageDedup.quarterKeys(element_at(col("frame_phashes"), 1)))
        .as("qkey"),
      struct(col("id"), col("frame_phashes").as("fh")).as("m"))
    val bucketFilter =
      if (maxBucketSize > 0) size(col("members")).between(2, maxBucketSize)
      else size(col("members")) > 1
    banded
      .groupBy(col("qkey"))
      .agg(collect_list(col("m")).as("members"))
      .filter(bucketFilter)
      .select(explode(filter(
        flatten(transform(col("members"), a =>
          transform(col("members"), b => struct(
            a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            a.getField("fh").as("fh_a"), b.getField("fh").as("fh_b"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        alignedMaxHamming(col("p.fh_a"), col("p.fh_b")).as("max_hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("max_hamming").isNotNull && col("max_hamming") <= maxHamming)
  }

  /** Full in-corpus video dedup: candidate pairs → connected components
    * → keep the min-id video per cluster; non-video payloads survive. */
  def dedupNearVideos(
      df: DataFrame, idCol: String, binCol: String,
      n: Int = DefaultSampledFrames,
      maxHamming: Int = ImageDedup.MaxBlockedHamming): DataFrame =
    Dedup.dedupNearByClusters(df, idCol,
      videoCandidatePairs(df, idCol, binCol, n, maxHamming))
}
