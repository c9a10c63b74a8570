package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio deduplication — the PCM leg of the multimodal dedup tier,
  * structurally the image tier with a different decode: byte-exact dedup
  * is [[ImageDedup.dedupExactBinary]] verbatim (binary is binary), and
  * the perceptual tier swaps the pixel pHash for the VOLUME-INVARIANT
  * energy-envelope hash ([[graft.functions.AudioKernels.envelopeHash64]]
  * — real RIFF/PCM sample decode, published layout, no codec library).
  * Everything else is shared machinery: 16-bit quarter blocking
  * (Hamming ≤ 3 pigeonhole recall), CC collapse, and the
  * [[ExactCatalog]]-delegated persistent catalog under its own `kind`
  * universe tag.
  */
object AudioDedup {

  /** The perceptual audio catalog's fingerprint universe: envelope
    * hashes blocked on 16-bit quarters — byte-compatible dirs with every
    * other delegated catalog, so the tag is what stops an image-phash
    * reader scrubbing against audio envelopes (and vice versa). */
  val KindEnvelope = "audio_env_q16"

  def withEnvelopeHash(df: DataFrame, binCol: String,
      out: String = "audio_fp"): DataFrame =
    df.withColumn(out, graft.functions.GraftFunctions.audioEnvelopeHash(col(binCol)))

  /** Near-duplicate candidate pairs by envelope-hash quarter blocking —
    * the blocking is hash-agnostic, so this is [[ImageDedup]]'s one-
    * shuffle bucket-explode over the audio hash. */
  def envelopeCandidatePairs(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming): DataFrame =
    ImageDedup.phashCandidatePairsFromHashes(
      graft.ops.Checkpoints.pin(
        df.select(col(idCol).as("id"),
          graft.functions.GraftFunctions.audioEnvelopeHash(col(binCol))
            .as("phash"))),
      maxHamming)

  /** Full in-corpus perceptual audio dedup: pairs → components → keep
    * the min-id recording; undecodable payloads survive. */
  def dedupNearAudio(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming): DataFrame =
    Dedup.dedupNearByClusters(df, idCol,
      envelopeCandidatePairs(df, idCol, binCol, maxHamming))

  /** One crawl/micro-batch against the persistent ENVELOPE catalog:
    * decode once (pinned), drop batch recordings within `maxHamming` of
    * any catalog hash (pruned quarter-key probe), collapse in-batch
    * clusters, deliver, append survivors — the shared
    * [[ImageCatalog.applyBatchHash]] core under [[KindEnvelope]]. */
  def applyBatchEnvelope(
      batch: DataFrame, dir: String, idCol: String, binCol: String,
      maxHamming: Int = ImageDedup.MaxBlockedHamming,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame =
    ImageCatalog.applyBatchHash(batch, dir, idCol, binCol,
      graft.functions.GraftFunctions.audioEnvelopeHash, KindEnvelope,
      maxHamming, numBuckets, added, maxPushdownKeys, deliver)

  // catalog lifecycle delegates like every kind over the shared layout
  def compact(
      spark: SparkSession, dir: String,
      retainAddedFrom: Option[Long] = None,
      buckets: Option[Seq[Int]] = None): Unit =
    ExactCatalog.compact(spark, dir, retainAddedFrom, buckets)
}
