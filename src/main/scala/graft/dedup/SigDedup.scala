package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared EXACT-SIGNATURE media dedup tier: one byte-walk kernel
  * turns a binary payload into a two-lane `(sig1, sig2, …)` struct that
  * is INVARIANT under the format's mutable-container edits (MP4 re-mux,
  * MP3 re-tag, FLAC re-tag) and sensitive to any media-byte change —
  * then one [[ExactCatalog]] per format does the rest. [[Mp4Dedup]],
  * [[Mp3Dedup]] and [[FlacDedup]] are thin bindings of this shape to
  * their kernels; keeping the probe/collapse/append logic in ONE place
  * means a fix to the family contract lands in every container format
  * at once (the [[graft.streaming.CatalogHygiene]] precedent).
  *
  * Family contract (shared by every binding):
  *  - drop batch payloads whose signature the catalog carries
  *    (bucket-pruned, key-pushed probe; both lanes must match — a false
  *    drop needs a simultaneous two-lane collision);
  *  - collapse in-batch signature groups to their MIN id;
  *  - null-signature payloads (off-format/malformed) pass through and
  *    never become catalog state;
  *  - deliver BEFORE append — at-least-once replays are suppressive,
  *    never lossy. */
object SigDedup {

  /** `(id, sig)` with the format's signature struct — one byte pass
    * feeds probe, in-batch collapse and append. `sig` must expose
    * `sig1`/`sig2` long fields (the family's paired-hash discipline). */
  def withSig(df: DataFrame, idCol: String, binCol: String,
      sigOf: Column => Column): DataFrame =
    df.select(col(idCol).as("id"), sigOf(col(binCol)).as("sig"))

  /** Catalog entries of a frame's DISTINCT signatures (out-of-band
    * catalog builds; applyBatch derives its own from the survivors). */
  def entriesOf(df: DataFrame, binCol: String,
      sigOf: Column => Column): DataFrame =
    df.select(sigOf(col(binCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("sig.sig1").as("fp"), col("sig.sig2").as("h2"))
      .distinct()

  /** One crawl/micro-batch against the persistent catalog — see the
    * class doc for the contract. Layout parameters are CREATE-TIME
    * defaults; an existing catalog's meta is authoritative. */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, binCol: String,
      sigOf: Column => Column, kind: String,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val hashed = graft.ops.Checkpoints.pin(withSig(batch, idCol, binCol, sigOf))
    val sigged = hashed.filter(col("sig").isNotNull)
    val cat = ExactCatalog.readForBatch(
      spark, dir, sigged.select(col("sig.sig1").as("fp")), maxPushdownKeys,
      kind = kind)
    val dropped = sigged
      .join(cat.select(col("fp"), col("h2")),
        col("sig.sig1") === col("fp") && col("sig.sig2") === col("h2"),
        "left_semi")
      .select(col("id"))
    // in-batch collapse among the catalog survivors: min id per
    // signature. Pinned (r17 optimization round): consumed by keepers
    // (itself read twice — the survivor join and the append) and by the
    // append's entry projection — unpinned, the catalog scan + semi-join
    // subtree re-executed ~3x per trigger
    val catSurvivors = graft.ops.Checkpoints.pin(
      sigged.join(dropped, Seq("id"), "left_anti"))
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
      kind = kind)
    out
  }
}
