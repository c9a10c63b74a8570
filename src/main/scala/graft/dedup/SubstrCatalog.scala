package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persistent WINDOW-FINGERPRINT catalog — the 100 TB shape for the
  * distinct window-fp SET [[SubstrDedup.dedupSubstringsIncremental]]
  * carries between crawls (Lee et al. 2022 span dedup, incremental
  * form). A year-long pipeline cannot re-fingerprint every prior crawl
  * per batch, and the in-memory set (~8 B per distinct corpus window ≈
  * one per corpus token) outgrows any driver long before the corpus
  * outgrows the cluster — so the set lives as a parquet catalog with
  * the SAME layout discipline as the exact-dedup catalog, to which all
  * storage mechanics delegate ([[ExactCatalog]]: bucket-partitioned by
  * `fp mod numBuckets`, fp-sorted files for row-group skipping, meta-
  * recorded bucket count, `added`-tag retention, per-bucket compaction,
  * rebucket-into-fresh-dir growth, [[graft.ops.VersionedStore]]
  * lifecycle).
  *
  * The delegated rows carry `h2 = fp`: the exact catalog's second hash
  * guards one-hash text collisions, but a window fingerprint IS already
  * a paired-polynomial 60-bit value
  * ([[graft.functions.GraftHash.tokenWindowFps]] — two independent
  * 30-bit lanes), and span dedup tolerates a ~2⁻⁶⁰ false window hit by
  * construction (the paper's suffix-array restatements all hash).
  * Duplicating the column costs nothing on disk — constant-per-row
  * within a (fp)-sorted row group, RLE collapses it — and buys the
  * entire maintenance surface with zero new layout code.
  *
  * Ownership needs no doc ids in the catalog: the prior corpus always
  * owns a window it contains (crawl order makes its copy first), so
  * membership is the whole state — see
  * [[SubstrDedup.removalStartsIncremental]].
  *
  * Scale shape per batch: occurrences are fingerprinted once (one scan,
  * pinned), the catalog probe reads ONLY the buckets the batch's
  * windows hash into (partition pruning; `fp IN` row-group pushdown
  * under the key cap, which window-fp batches typically overflow —
  * bucket pruning still bounds the read to batch-touched buckets), the
  * join is an 8-byte-key hash join, and the advance appends only the
  * batch's NOVEL distinct fps, so the catalog stays distinct-modulo-
  * replay without a global rewrite. Per-batch work is O(batch × bucket
  * occupancy), never O(catalog).
  *
  * Crash/replay contract (deliver-before-append, as everywhere): the
  * rewritten batch is DELIVERED via the callback before any append, so
  * one complete, correct delivery always precedes catalog advance. A
  * replay whose append already landed is SUPPRESSIVE — the batch's own
  * windows are now catalog members, so the replayed delivery scrubs
  * them as cross-crawl duplicates (for the exact catalog replay
  * delivers zero survivors; here it delivers over-removed rewrites).
  * Downstream must therefore be idempotent per document id, keeping the
  * FIRST delivered rewrite — the standard at-least-once discipline, and
  * the reason `deliver` is a callback rather than "write after the call
  * returns".
  */
object SubstrCatalog {

  /** Meta `kind` tag: window fingerprints, NOT document fingerprints —
    * the dirs are byte-compatible with [[ExactCatalog]]'s, so the meta
    * says which universe the rows come from and every reader/appender
    * on either side refuses a mismatch (see [[ExactCatalog.KindExact]]).
    * The tag CARRIES THE WINDOW WIDTH: `w` is a layout property exactly
    * like the bucket count (a w=8 catalog probed with w=4 windows is a
    * different fingerprint universe — nothing would ever match), so it
    * is recorded at creation, derived on open, and a same-prefix
    * different-w tag refuses through the ordinary kind machinery. */
  val KindPrefix = "substr_window_fp_w"

  def kindFor(w: Int): String = s"$KindPrefix$w"

  /** The catalog's recorded window width (None: no catalog, or not a
    * window-fp catalog). The suffix must be FULLY numeric: a corrupted
    * or future same-prefix tag (`substr_window_fp_w8x`) falls through to
    * None here, so callers reach the kind machinery's loud
    * universe-mismatch refusal instead of a bare NumberFormatException
    * (r11 ADVICE). */
  private val KindRe = (java.util.regex.Pattern.quote(KindPrefix) + """(\d+)""").r
  def metaW(spark: SparkSession, dir: String): Option[Int] =
    ExactCatalog.readMetaKind(spark, dir).collect {
      case KindRe(w) => w
    }.flatMap(_.toIntOption) // Int-overflow digits also fall through to None

  /** Catalog entries of a document frame: the distinct window-fp set in
    * the delegated `(fp, h2 = fp)` shape (see class doc). */
  def entriesOf(docs: DataFrame, textCol: String, w: Int): DataFrame =
    SubstrDedup.windowFpSet(docs, textCol, w)
      .select(col("fp"), col("fp").as("h2"))

  /** Append a distinct window-fp set (fingerprinted at width `w`) under
    * the caller's `added` tag. */
  def append(
      entries: DataFrame, dir: String, w: Int,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L): Unit =
    ExactCatalog.append(entries, dir, numBuckets, added, kind = kindFor(w))

  /** The whole catalog's fp set (empty before the first append; refuses
    * a dir whose rows are not window fingerprints). */
  def readFps(spark: SparkSession, dir: String): DataFrame = {
    val kind = ExactCatalog.readMetaKind(spark, dir) match {
      case Some(k) =>
        require(k.startsWith(KindPrefix),
          s"catalog at $dir holds '$k' fingerprints, not window fps")
        k
      case None => kindFor(0) // empty dir: ExactCatalog.read returns empty
    }
    ExactCatalog.read(spark, dir, kind = kind).select(col("fp"))
  }

  /** One crawl/micro-batch against the persistent catalog: window
    * occurrences pinned once, pruned catalog probe, incremental
    * keep-first-owner span removal + token rewrite
    * ([[SubstrDedup.dedupSubstringsIncremental]] semantics,
    * [[SubstrDedup.dedupSubstrings]] output shape: `(idCol, n_tokens,
    * n_removed, clean_text)`), DELIVERED via the callback, then the
    * batch's novel distinct fps appended under `added`, and returned.
    *
    * `numBuckets` AND `w` are CREATE-TIME defaults only — an existing
    * catalog's meta decides both (same contract as
    * [[ExactCatalog.applyBatch]]; a caller passing a different `w` than
    * the catalog was built with would otherwise probe a disjoint
    * fingerprint universe and scrub nothing). */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, textCol: String, w: Int,
      numBuckets: Int = ExactCatalog.DefaultBuckets, added: Long = 0L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val effW = metaW(spark, dir).getOrElse(w) // meta wins once it exists
    // pin the occurrence scan once: it feeds the pushdown probe, the
    // ownership aggregate, the catalog join AND the advance
    val occ = graft.ops.Checkpoints.pin(
      SubstrDedup.windowOccurrences(batch, idCol, textCol, effW))
    // pinned (r18, guide §1.2/§5): the pruned catalog read feeds the
    // rewrite's removal-start join AND the append's novel anti-join —
    // unpinned, the probe scan (on overflow batches, the range-filtered
    // scan over every probed bucket — the expensive half of this
    // operator) re-executed once per consumer. The pin holds only the
    // matched fps, bounded by the batch's window superset.
    val catFps = graft.ops.Checkpoints.pin(ExactCatalog.readForBatch(
      spark, dir, occ.select(col("fp")), maxPushdownKeys,
      kind = kindFor(effW))
      .select(col("fp")))
    // pin the rewrite (like every applyBatch in the family): deliver AND
    // the returned frame must see one materialized result — unpinned,
    // the return value would re-run the rewrite against the catalog's
    // CURRENT file listing, which a later compaction deletes out from
    // under it
    val out = graft.ops.Checkpoints.pin(
      rewrite(batch, occ, catFps, idCol, textCol, effW))
    deliver(out) // delivery BEFORE the append — see class doc
    // advance = the batch's distinct fps the catalog lacks; the anti-join
    // runs against the SAME pruned read (a catalog fp outside the probed
    // buckets can't equal a batch fp by construction of the pruning)
    val novel = occ.select(col("fp")).distinct()
      .join(catFps, Seq("fp"), "left_anti")
      .select(col("fp"), col("fp").as("h2"))
    ExactCatalog.append(novel, dir,
      ExactCatalog.readMeta(spark, dir).getOrElse(numBuckets), added,
      kind = kindFor(effW))
    out
  }

  /** The incremental rewrite stage shared with [[applyBatch]] — also the
    * parity surface the spec pins against the in-memory
    * [[SubstrDedup.dedupSubstringsIncremental]]. */
  private def rewrite(
      batch: DataFrame, occ: DataFrame, catFps: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame =
    SubstrDedup.dedupSubstringsFromStarts(
      batch,
      SubstrDedup.removalStartsIncrementalFromOcc(occ, catFps, idCol),
      idCol, textCol, w)

  // ------------------------------------------------------- maintenance
  // The layout is byte-identical to the exact catalog's, so the whole
  // lifecycle delegates; only the entry semantics differ.

  def fileCount(spark: SparkSession, dir: String): Int =
    ExactCatalog.fileCount(spark, dir)

  def compact(
      spark: SparkSession, dir: String,
      retainAddedFrom: Option[Long] = None,
      buckets: Option[Seq[Int]] = None): Unit =
    ExactCatalog.compact(spark, dir, retainAddedFrom, buckets)

  def rebucket(
      spark: SparkSession, fromDir: String, toDir: String,
      newBuckets: Int): Unit =
    ExactCatalog.rebucket(spark, fromDir, toDir, newBuckets)

  def maintain(
      spark: SparkSession, dir: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = false): Seq[graft.ops.GrowthPolicy.Action] =
    ExactCatalog.maintain(spark, dir, policy, autoCompact)

  def maintainVersioned(
      spark: SparkSession, root: String,
      policy: graft.ops.GrowthPolicy.Policy = graft.ops.GrowthPolicy.Policy(),
      autoCompact: Boolean = true
  ): (String, Seq[graft.ops.GrowthPolicy.Action]) =
    ExactCatalog.maintainVersioned(spark, root, policy, autoCompact)
}
