package graft.streaming

/** The post-append hygiene step shared by every catalog-backed
  * streaming tier ([[StreamingExactDedup]], [[StreamingNearDedup]],
  * [[StreamingSubstrDedup]]): per-bucket auto-compaction
  * (`compactAboveFiles` is a per-bucket file threshold; 0 disables —
  * see [[StreamingNearDedup.applyBatch]] for why per-bucket is the only
  * shape that survives a catalog with more buckets than any global
  * threshold), with a FULL retention sweep every `retentionSweepEvery`
  * batches when `retainAddedBehind` is set (per-bucket compaction alone
  * only ages out buckets that keep taking appends). One implementation
  * so a fix to the cadence rule lands in every tier at once.
  *
  * The two knobs are independent (r11 ADVICE): `compactAboveFiles <= 0`
  * disables only the per-bucket file-count compaction; a configured
  * retention still runs its periodic full sweep (the old coupling
  * silently grew the catalog forever for a caller setting retention
  * with compaction off). */
private[streaming] object CatalogHygiene {

  def afterAppend(
      compactAboveFiles: Int, added: Long,
      retainAddedBehind: Option[Long], retentionSweepEvery: Long)(
      bucketFileCounts: => Map[Int, Int],
      compact: (Option[Long], Option[Seq[Int]]) => Unit): Unit = {
    val cutoff = retainAddedBehind.map(b => added - b)
    if (cutoff.isDefined && retentionSweepEvery > 0 && added > 0 &&
        added % retentionSweepEvery == 0)
      compact(cutoff, None) // full sweep — runs even with compaction off
    else if (compactAboveFiles > 0) {
      val over = bucketFileCounts.filter(_._2 > compactAboveFiles).keys.toSeq
      if (over.nonEmpty) compact(cutoff, Some(over))
    }
  }
}
