package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * One [[ExactCatalog]]-delegated tier (kind `mp3_frames_sig`): the
  * usual bucket-pruned key-pushed probe, min-id in-batch collapse, and
  * the family crash contract — deliver BEFORE append, replays
  * suppressive. Non-MP3 / malformed payloads (null signature) pass
  * through and never enter the catalog. */
object Mp3Dedup {

  val Kind = "mp3_frames_sig"

  /** `(id, sig)` with the frame-stream signature struct — one byte
    * pass feeds probe, in-batch collapse and append. */
  def withSig(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.mp3FramesSig(col(binCol)).as("sig"))

  /** Catalog entries of a frame's DISTINCT signatures (out-of-band
    * catalog builds; applyBatch derives its own from the survivors). */
  def entriesOf(df: DataFrame, binCol: String): DataFrame =
    df.select(graft.functions.GraftFunctions.mp3FramesSig(col(binCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("sig.sig1").as("fp"), col("sig.sig2").as("h2"))
      .distinct()

  /** One crawl/micro-batch against the persistent catalog: drop batch
    * tracks whose frame signature the catalog carries, collapse
    * in-batch signature groups to their min id, deliver, append the
    * survivors' signatures. Layout parameters are CREATE-TIME defaults;
    * an existing catalog's meta is authoritative. */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, binCol: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val hashed = graft.ops.Checkpoints.pin(withSig(batch, idCol, binCol))
    val sigged = hashed.filter(col("sig").isNotNull)
    val cat = ExactCatalog.readForBatch(
      spark, dir, sigged.select(col("sig.sig1").as("fp")), maxPushdownKeys,
      kind = Kind)
    val dropped = sigged
      .join(cat.select(col("fp"), col("h2")),
        col("sig.sig1") === col("fp") && col("sig.sig2") === col("h2"),
        "left_semi")
      .select(col("id"))
    // in-batch collapse among the catalog survivors: min id per signature
    val catSurvivors = sigged.join(dropped, Seq("id"), "left_anti")
    val keepers = catSurvivors
      .groupBy(col("sig")).agg(min(col("id")).as("id"))
      .select(col("id"))
      // null-sig rows always pass (never duplicates, never catalog state)
      .unionByName(hashed.filter(col("sig").isNull).select(col("id")))
    // pinned: the survivor set must not lazily re-read catalog files a
    // later compaction/rebucket may retire (the family discipline)
    val out = graft.ops.Checkpoints.pin(
      batch.join(keepers.select(col("id").as(idCol)), Seq(idCol), "left_semi"))
    deliver(out) // delivery BEFORE the append — family crash contract
    ExactCatalog.append(
      catSurvivors.join(keepers, Seq("id"), "left_semi")
        .select(col("sig.sig1").as("fp"), col("sig.sig2").as("h2"))
        .distinct(),
      dir, ExactCatalog.readMeta(spark, dir).getOrElse(numBuckets), added,
      kind = Kind)
    out
  }
}
