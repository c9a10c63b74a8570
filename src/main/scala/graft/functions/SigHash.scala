package graft.functions

import org.apache.spark.sql.catalyst.InternalRow

/** The media-signature family's PAIRED-HASH discipline in one place —
  * the byte-side half of the contract whose DataFrame-side half lives
  * in [[graft.dedup.SigDedup]]: two FNV-1a-64 lanes with independent
  * offset bases, the payload length mixed into lane 1, lane 2
  * avalanche-finalized (murmur fmix64). A false drop needs a
  * simultaneous two-lane collision. Every container kernel
  * ([[Mp4Kernels.mdatSig]], [[Mp3Kernels.framesSig]],
  * [[FlacKernels.streamSig]], [[OggKernels.packetsSig]]) folds its
  * bytes with [[Prime]]/[[Basis1]]/[[Basis2]] and finalizes through
  * [[finish]] — a change to the discipline lands in every format at
  * once instead of diverging per copy. */
private[functions] object SigHash {

  /** FNV-1a 64 prime, both lanes. */
  val Prime = 0x100000001b3L
  /** FNV offset basis (lane 1). */
  val Basis1 = 0xcbf29ce484222325L
  /** Golden-ratio alternate basis (lane 2). */
  val Basis2 = 0x9e3779b97f4a7c15L

  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** Family finalization → `(sig1, sig2, total)` row. */
  def finish(h1: Long, h2: Long, total: Long): InternalRow =
    InternalRow((h1 ^ total) * Prime,
      fmix64(h2 ^ java.lang.Long.rotateLeft(total, 32)), total)
}
