package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}

/** EXACT/RE-TAG dedup for MPEG audio (MP3) — the dominant crawled
  * COMPRESSED audio format, which the PCM envelope tier cannot reach
  * because MPEG decode is outside the public JDK (the r14 verdict's
  * compressed-audio gap, closed the way the MP4 tier closed the video
  * container gap). The fingerprint is the two-lane hash of the
  * CONCATENATED MPEG frame bytes
  * ([[graft.functions.Mp3Kernels.framesSig]]): ID3v1/ID3v2 tag edits —
  * everything a re-tagger, media library or re-hoster touches — leave
  * it unchanged, so byte-identical and re-tagged copies drop while
  * re-ENCODES (new frame bytes) pass. Exactly the [[Mp4Dedup]]
  * contract one container over.
  *
  * One [[SigDedup]] binding (kind `mp3_frames_sig`): bucket-pruned
  * key-pushed probe, min-id in-batch collapse, deliver BEFORE append.
  * Non-MP3 / malformed payloads (null signature) pass through and
  * never enter the catalog. */
object Mp3Dedup {

  val Kind = "mp3_frames_sig"

  private val sigOf: Column => Column =
    graft.functions.GraftFunctions.mp3FramesSig

  /** `(id, sig)` with the frame-stream signature struct. */
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
