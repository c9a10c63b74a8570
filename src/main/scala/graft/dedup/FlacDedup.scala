package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}

/** EXACT/RE-TAG dedup for FLAC — the lossless leg of the compressed-
  * audio family: the frame region is a contiguous suffix after the
  * metadata chain, so the fingerprint is the two-lane hash of the bytes
  * past the last metadata block ([[graft.functions.FlacKernels
  * .streamSig]]). Tag edits (VORBIS_COMMENT, PICTURE, PADDING — the
  * whole mutable surface) leave it unchanged; re-encodes pass. (AAC
  * audio ships in M4A/BMFF containers and is covered by [[Mp4Dedup]]'s
  * mdat signature; Ogg remains the one compressed-audio container
  * without a leg — its page-level walk is future work, documented.)
  *
  * One [[SigDedup]] binding (kind `flac_stream_sig`) — the family
  * probe/collapse/crash contract. */
object FlacDedup {

  val Kind = "flac_stream_sig"

  private val sigOf: Column => Column =
    graft.functions.GraftFunctions.flacStreamSig

  /** `(id, sig)` with the stream signature struct. */
  def withSig(df: DataFrame, idCol: String, binCol: String): DataFrame =
    SigDedup.withSig(df, idCol, binCol, sigOf)

  /** Catalog entries of a frame's DISTINCT signatures. */
  def entriesOf(df: DataFrame, binCol: String): DataFrame =
    SigDedup.entriesOf(df, binCol, sigOf)

  /** One crawl/micro-batch against the persistent catalog — the
    * [[SigDedup]] family contract. */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame =
    SigDedup.applyBatch(batch, dir, idCol, binCol, sigOf, Kind,
      numBuckets, added, maxPushdownKeys, deliver)
}
