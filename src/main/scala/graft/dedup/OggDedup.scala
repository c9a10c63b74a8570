package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}

/** EXACT/RE-TAG dedup for Ogg (Vorbis/Opus) — the final audio
  * container leg: packets are reassembled from the page/lacing framing
  * and the signature hashes the AUDIO packets (codec header packets
  * sniffed and skipped), so comment-packet rewrites — which re-segment,
  * re-number and re-CRC every following page — are invisible
  * ([[graft.functions.OggKernels.packetsSig]]). With this, every major
  * crawled audio container has a leg: WAV/PCM (perceptual envelope),
  * MP3 (frame signature), M4A/AAC (mdat signature), FLAC (stream
  * signature), Ogg (packet signature).
  *
  * One [[SigDedup]] binding (kind `ogg_packets_sig`) — the family
  * probe/collapse/crash contract. */
object OggDedup {

  val Kind = "ogg_packets_sig"

  private val sigOf: Column => Column =
    graft.functions.GraftFunctions.oggPacketsSig

  /** `(id, sig)` with the packet-stream signature struct. */
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
