package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions
import graft.text.TextOps

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: one hash-shuffle on a 64-bit fingerprint (never on the full
  *    text — grouping on a long keeps shuffle rows tiny; full-text equality
  *    is only confirmed within the tiny fingerprint-collision groups).
  *  - MinHash+LSH: signature in one scan pass (custom codegen'd
  *    expression), banding explode of b rows/doc, shuffle on (band, key) —
  *    candidate generation never goes quadratic; exact Jaccard only on
  *    candidate pairs.
  *  - SimHash: one 64-bit signature per doc; near-dup = identical signature
  *    band keys (Hamming blocking by 16-bit quarters).
  *  - embedding cosine: random-hyperplane LSH bucketing; exact cosine only
  *    within buckets.
  */
object Dedup {

  // -------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------

  /** Exact duplicate groups: canonical id = min(id) per identical text.
    * Output one row per distinct text: (canonical id, n_dups).
    * The shuffle key is fingerprint64(text) — 8 bytes — not the text;
    * text equality is re-checked inside each fingerprint group, so hash
    * collisions cannot merge distinct texts. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol),
        GraftFunctions.fingerprint64(col(textCol)).as("__fp"))
      .groupBy(col("__fp"), col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))
      .select(col("canonical_id"), col("n_dups"))

  /** Exact-dedup projection: keep only the min-id row per identical text. */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window
      .partitionBy(GraftFunctions.fingerprint64(col(textCol)), col(textCol))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Build the dedup CATALOG of a corpus: one `(fp, h2)` row per distinct
    * document — the compact persistent state an incremental pipeline
    * carries between crawls. `secondKey` is the collision re-check column:
    * the raw text for byte-exact semantics (oracle-friendly), or
    * `xxhash64` for an O(16 bytes/doc) catalog at corpus scale (false
    * drops then need a simultaneous 2-hash collision). */
  def dedupCatalog(
      docs: DataFrame, textCol: String,
      secondKey: Column => Column = identity): DataFrame =
    docs.select(
      GraftFunctions.fingerprint64(col(textCol)).as("fp"),
      secondKey(col(textCol)).as("h2"))
      .distinct()

  /** Incremental exact dedup: the rows of `newDocs` that survive BOTH the
    * in-batch collapse (first occurrence per distinct text) and the
    * anti-join against an existing [[dedupCatalog]] — dedup a new crawl
    * against the corpus without ever re-reading the corpus text.
    *
    * Scale shape: one shuffle for the in-batch collapse, one anti-join
    * shuffled on (fp, h2) against the catalog (16 bytes/doc with hashed
    * `secondKey`). Spark's runtime bloom-filter join optimization
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) prefilters the
    * probe side of exactly this join shape declaratively — no hand-rolled
    * sketch needed. */
  def dedupIncremental(
      newDocs: DataFrame, catalog: DataFrame, idCol: String, textCol: String,
      secondKey: Column => Column = identity): DataFrame = {
    val fresh = dedupExact(newDocs, idCol, textCol)
    fresh
      .withColumn("__fp", GraftFunctions.fingerprint64(col(textCol)))
      .withColumn("__h2", secondKey(col(textCol)))
      .join(catalog.select(col("fp").as("__cfp"), col("h2").as("__ch2")),
        col("__fp") === col("__cfp") && col("__h2") === col("__ch2"), "left_anti")
      .drop("__fp", "__h2")
  }

  // -------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------

  /** Per-doc MinHash signature over byte shingles: one scan, no
    * shuffle, allocation-free (the signature is computed directly over
    * the text's byte windows — materializing a shingle array first costs
    * ~5x in allocation pressure at corpus scale). k = bands * rowsPerBand
    * lanes. The PORTABLE kernel ([[GraftFunctions.minhashFp]]): rolling
    * base-31 fingerprints → quadratic premix `(h² + h) mod p` → affine
    * lane remixes, so the whole LSH pipeline is restatable in DuckDB SQL
    * and the `minhash_pairs` gate checks it end to end (it was rows-only
    * before round 6). The premix matters: affine lanes straight over the
    * LINEAR rolling fingerprint skew the per-lane argmin onto a few
    * popular shingles and band buckets explode quadratically (see
    * [[graft.functions.GraftHash.minhashFpSignature]]). */
  def withMinhashSignature(
      df: DataFrame, textCol: String, shingleSize: Int, k: Int): DataFrame =
    df.withColumn("__sig",
      GraftFunctions.minhashFp(col(textCol), shingleSize, k))

  /** Portable band key: base-31 fold of a signature slice (same
    * polynomial family as `fingerprint64`) — exact integer arithmetic in
    * any engine, unlike `xxhash64`. Lane values are < 2^30 so
    * `h * 31 + v` stays far from Long overflow. */
  private def bandKeyExpr(sig: Column, from: Column, len: Int): Column =
    aggregate(slice(sig, from, lit(len)), lit(0L),
      (h, v) => (h * 31 + v) % lit(graft.functions.GraftHash.FpMod))

  /** LSH banding: explode each doc into `bands` rows keyed by the hash of
    * its band slice; docs sharing any band key are candidates. Estimated
    * Jaccard = matching lanes / k over the full signatures.
    *
    * Run [[dedupExact]] FIRST on real corpora: an n-way exact-duplicate
    * cluster shares every band, so its candidate pairs are quadratic in n
    * by construction — collapsing exact dups first keeps buckets small.
    * `maxBucketSize` (0 = unlimited) is the safety valve for remaining
    * degenerate buckets: oversized ones are dropped (boilerplate/empty
    * texts), which is standard LSH hygiene at corpus scale. */
  /** Minimal banding with EXACT recall relative to the downstream
    * estimated-Jaccard filter. A pair estimated at `>= threshold` matches
    * at least `ceil(k*threshold)` of the k lanes, so it MIS-matches at
    * most `k - ceil(k*threshold)`; the bands partition the lanes, so when
    * that mismatch budget is smaller than the band count the mismatches
    * cannot touch every band — at least one band matches whole and the
    * pair is a guaranteed candidate. Returns the smallest divisor `b` of
    * `k` above the budget (fewest bands = fewest candidate explosions:
    * candidate volume falls ~geometrically in rows-per-band), as
    * (bands, rowsPerBand); None when even single-lane bands can't
    * guarantee it (low-threshold regime — there LSH recall is properly
    * probabilistic and the classic 16×4-style tuning applies).
    *
    * Measured on the 20k-doc bench corpus at threshold 0.9: (8, 8) from
    * this rule produces the IDENTICAL survivor set to (16, 4) with ~16×
    * fewer pre-filter candidates and ~2.5× less wall clock. */
  def exactRecallBanding(k: Int, threshold: Double): Option[(Int, Int)] = {
    require(k > 0 && threshold > 0.0 && threshold <= 1.0)
    val maxMiss = k - math.ceil(k * threshold).toInt
    (1 to k).find(b => k % b == 0 && b > maxMiss).map(b => (b, k / b))
  }

  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      maxBucketSize: Int = 0): DataFrame = {
    // (id, sig) is consumed three times (banding + both signature joins).
    // Checkpoints.pin (NOT cache) materializes the narrow projection once:
    // cache() would register it with the session CacheManager, which pins
    // the blocks until an explicit unpersist that a lazily-returned
    // DataFrame cannot schedule — a leak per invocation. Checkpoint blocks
    // are dropped by the ContextCleaner when the plan is garbage-collected.
    val sig = graft.ops.Checkpoints.pin(
      withMinhashSignature(df, textCol, shingleSize, bands * rowsPerBand)
        .select(col(idCol).as("id"), col("__sig")))
    minhashCandidatePairsFromSigs(
      sig, bands, rowsPerBand, jaccardThreshold, maxBucketSize)
  }

  /** [[minhashCandidatePairs]] over an ALREADY-COMPUTED (and pinned)
    * `(id, __sig)` frame — the seam that lets one MinHash pass feed the
    * catalog probe, the incremental join, the in-batch pairs AND the
    * catalog append (the signature scan is the dominant per-batch cost;
    * computing it once per consumer doubled streaming trigger work). */
  def minhashCandidatePairsFromSigs(
      sig: DataFrame,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      maxBucketSize: Int = 0): DataFrame = {
    val k = bands * rowsPerBand
    val banded = sig.select(
      col("id"), col("__sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => bandKeyExpr(col("__sig"), b * rowsPerBand + 1, rowsPerBand))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

    // ONE shuffle on (band, band_key): bucket member IDS are collected and
    // pairs exploded in place — half the shuffle volume of a self-join and
    // no join build side. Pairs carry ids ONLY (16 bytes each): carrying
    // signatures through the quadratic in-bucket explosion would blow
    // memory on hot buckets; signatures are joined back afterwards, once
    // per distinct candidate pair.
    val bucketFilter =
      if (maxBucketSize > 0) size(col("members")).between(2, maxBucketSize)
      else size(col("members")) > 1
    val candidates = banded
      .groupBy(col("band"), col("band_key"))
      .agg(collect_list(col("id")).as("members"))
      .filter(bucketFilter)
      .select(explode(filter(
        flatten(transform(col("members"), a =>
          transform(col("members"), b =>
            struct(a.as("id_a"), b.as("id_b"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b") // same pair from several bands

    // SHUFFLE_HASH pins the physical join: sorting rows that carry k-long
    // signature arrays (sort-merge's prerequisite) is wasted work at any
    // scale, and without the hint AQE flips between broadcast and SMJ
    // run-to-run when the signature table sits near the 10 MB broadcast
    // threshold (observed 2.4× bench swings). Hash build side is the
    // per-partition slice of (id, sig) — bounded by the shuffle partition
    // count, never the corpus.
    candidates
      .join(sig.select(col("id").as("id_a"), col("__sig").as("sig_a"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sig.select(col("id").as("id_b"), col("__sig").as("sig_b"))
        .hint("SHUFFLE_HASH"), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** EXACT n-gram Jaccard verification of candidate pairs — the refine
    * stage after LSH banding (generate loosely, verify exactly: the
    * standard two-phase shape at corpus scale). Each doc's shingle set is
    * the sorted distinct premixed window fingerprints
    * ([[graft.functions.GraftHash.shingleFpSet]]) — the SAME universe the
    * MinHash signature estimated over, so "estimate then verify" measures
    * one quantity. The threshold is a rational `num/den` applied by
    * integer cross-multiplication (`inter * den >= union * num`), exact
    * in any engine — no float division ever happens.
    *
    * Scale shape: one scan computes each doc's set (bounded by its byte
    * length), then two SHUFFLE_HASH joins ship sets only to docs that
    * appear in candidate pairs — per-pair cost is one merge of two sorted
    * arrays; total volume is |pairs| × doc-set size, already LSH-pruned.
    * Never quadratic in the corpus. */
  def verifyJaccardExact(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame,
      shingleSize: Int = 5,
      thresholdNum: Int = 7,
      thresholdDen: Int = 10): DataFrame = {
    require(thresholdDen > 0 && thresholdNum >= 0, "threshold must be a nonnegative rational")
    val sized = docs.select(
      col(idCol).as("id"),
      GraftFunctions.shingleFpSet(col(textCol), shingleSize).as("__sh"))
      .withColumn("__n", size(col("__sh")).cast(LongType))
    pairs.select(col("id_a"), col("id_b"))
      .join(sized.select(col("id").as("id_a"), col("__sh").as("__sha"),
        col("__n").as("__na")).hint("SHUFFLE_HASH"), "id_a")
      .join(sized.select(col("id").as("id_b"), col("__sh").as("__shb"),
        col("__n").as("__nb")).hint("SHUFFLE_HASH"), "id_b")
      .withColumn("inter_size",
        size(array_intersect(col("__sha"), col("__shb"))).cast(LongType))
      .withColumn("union_size", col("__na") + col("__nb") - col("inter_size"))
      .filter(col("inter_size") * thresholdDen >= col("union_size") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter_size"), col("union_size"))
  }

  /** Persistent NEAR-dup catalog of a corpus: one (id, minhash signature)
    * row per doc — `4k` bytes each, never the text. Signatures are
    * sufficient state: band keys re-derive from signature slices, so the
    * incremental path needs no separate bucket table and the catalog
    * appends cheaply crawl over crawl. */
  def minhashNearCatalog(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    withMinhashSignature(docs, textCol, shingleSize, bands * rowsPerBand)
      .select(col(idCol).as("id"), col("__sig"))

  private[dedup] def bandKeys(df: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    df.select(col("id"), col("__sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => bandKeyExpr(col("__sig"), b * rowsPerBand + 1, rowsPerBand))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")

  /** Incremental near-dedup: drop new-crawl docs whose estimated Jaccard
    * against ANY catalog doc clears the threshold, then collapse the
    * in-batch near-dup clusters among what remains. Returns the surviving
    * (idCol, textCol) rows; append [[minhashNearCatalog]] of the survivors
    * to the catalog for the next crawl.
    *
    * Scale shape: corpus text is never read — both sides band from
    * signatures and meet in ONE shuffle join on (band, band_key); matched
    * pairs carry ids only and the signature re-join confirms the estimate
    * per distinct pair. Hot buckets are a catalog-quality problem, the
    * same valve ([[minhashCandidatePairs]] `maxBucketSize`) applies to the
    * in-batch half; the cross join stays linear in bucket occupancy under
    * AQE skew handling. */
  def dedupNearIncremental(
      newDocs: DataFrame, catalog: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7): DataFrame = {
    val oldBanded = bandKeys(catalog, bands, rowsPerBand)
      .select(col("band"), col("band_key"), col("id").as("old_id"))
    val oldSigs = catalog.select(col("id").as("old_id"), col("__sig").as("sig_o"))
    dedupNearIncrementalCore(newDocs, oldBanded, oldSigs, idCol, textCol,
      shingleSize, bands, rowsPerBand, jaccardThreshold)
  }

  /** [[dedupNearIncremental]] against a PRE-BANDED catalog frame —
    * `(band, band_key, id, __sig)` rows, normally the partition-pruned
    * read of a [[BandedCatalog]] — so a micro-batch pays for the
    * catalog BUCKETS its docs hash into, never a full-catalog re-band.
    * Semantics are identical to the flat path (the banded rows ARE
    * `bandKeys(catalog)` with the signature carried along); parity is
    * pinned in StreamingNearDedupSpec. */
  def dedupNearIncrementalBanded(
      newDocs: DataFrame, bandedCatalog: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      newSigs: Option[DataFrame] = None): DataFrame = {
    // pin the pruned catalog read ONCE (r17): it feeds both the band
    // join and the signature re-join below — unpinned, the parquet
    // probe scan (the trigger's I/O) executes twice per trigger, once
    // per consumer subtree. Bounded by construction: the pruned read is
    // O(batch × bucket occupancy), the same bound the whole trigger
    // design rests on.
    val cat = graft.ops.Checkpoints.pin(bandedCatalog)
    val oldBanded = cat
      .select(col("band"), col("band_key"), col("id").as("old_id"))
    // one signature row per catalog doc: a doc repeats across its band
    // rows (and possibly across duplicate-tolerant compaction leftovers)
    val oldSigs = cat
      .select(col("id").as("old_id"), col("__sig").as("sig_o"))
      .dropDuplicates("old_id")
    dedupNearIncrementalCore(newDocs, oldBanded, oldSigs, idCol, textCol,
      shingleSize, bands, rowsPerBand, jaccardThreshold, newSigs)
  }

  /** Shared incremental near-dedup core: candidate hits travel as ids
    * only through the band join; signatures rejoin per DISTINCT pair.
    * `newSigs`: an already-PINNED `(id, __sig)` frame for the batch (the
    * [[minhashNearCatalog]] shape) — callers that computed signatures
    * anyway (the streaming loop: probe + append) pass it so the MinHash
    * scan, the batch's dominant cost, runs once per trigger instead of
    * once per consumer. */
  private def dedupNearIncrementalCore(
      newDocs: DataFrame, oldBanded: DataFrame, oldSigs: DataFrame,
      idCol: String, textCol: String,
      shingleSize: Int, bands: Int, rowsPerBand: Int,
      jaccardThreshold: Double,
      newSigs: Option[DataFrame] = None): DataFrame = {
    val k = bands * rowsPerBand
    val newSig = newSigs.getOrElse(graft.ops.Checkpoints.pin(minhashNearCatalog(
      newDocs, idCol, textCol, shingleSize, bands, rowsPerBand)))
    val newBanded = bandKeys(newSig, bands, rowsPerBand)
      .select(col("band"), col("band_key"), col("id").as("new_id"))

    val hits = newBanded.join(oldBanded, Seq("band", "band_key"))
      .select(col("new_id"), col("old_id")).dropDuplicates("new_id", "old_id")
      .join(newSig.select(col("id").as("new_id"), col("__sig").as("sig_n")), "new_id")
      .join(oldSigs, "old_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_n"), col("sig_o"), (x, y) => x === y),
          b => b)).cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= jaccardThreshold)
      .select(col("new_id").as(idCol)).distinct()

    // pin the catalog-surviving set ONCE (r17): `fresh` anchors BOTH the
    // in-batch pair generation (via freshSigs, evaluated eagerly inside
    // clusterPairs) and the final cluster join — unpinned, the whole
    // `hits` join chain (band join + two signature re-joins over the
    // pruned catalog read) re-executed once per consumer, the dominant
    // duplicated work in every near trigger
    val fresh = graft.ops.Checkpoints.pin(
      newDocs.join(hits, Seq(idCol), "left_anti"))
    // in-batch pairs band the SAME pinned signatures, filtered to the
    // surviving ids — a projection over checkpoint blocks, not a rescan
    val freshSigs = newSig.join(
      fresh.select(col(idCol).as("id")), Seq("id"), "left_semi")
    val inBatchPairs = minhashCandidatePairsFromSigs(
      freshSigs, bands, rowsPerBand, jaccardThreshold)
    dedupNearByClusters(fresh, idCol, inBatchPairs)
  }

  // -------------------------------------------------------------------
  // Exact n-gram Jaccard (verification / small-candidate-set refinement)
  // -------------------------------------------------------------------

  /** Exact Jaccard similarity between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(array_union(a, b)).cast(DoubleType)
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Exact word-n-gram Jaccard for a candidate pair set: join texts back,
    * compute set overlap. `pairs` must have (id_a, id_b). */
  def verifyPairsJaccard(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      TextOps.wordShingles(col(textCol), ngram).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .drop("sh_a", "sh_b")
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 60-bit PORTABLE SimHash per doc + quarter-band keys for Hamming
    * blocking: docs within Hamming distance 3 share at least one
    * identical 15-bit quarter (pigeonhole over 4 blocks), so blocking on
    * quarters finds all near pairs with one shuffle. The signature is
    * the per-bit majority vote over the tokens' 60-bit combined rolling
    * fingerprints ([[GraftFunctions.simhashFp]] over the oracle-proven
    * `tokenize_ws` kernel) — every step exact integer arithmetic DuckDB
    * can restate, so `simhash_docs` hash-checks end to end (rows-only
    * before round 6). */
  def withSimhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash",
      GraftFunctions.simhashFp(TextOps.tokens(col(textCol))))

  def simhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = withSimhash(df, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * 15).bitwiseAND(lit(0x7fffL))): _*)))
      .withColumnRenamed("pos", "quarter").withColumnRenamed("col", "qkey")
    // same one-shuffle bucket-explode shape as minhashCandidatePairs;
    // the signature here is a single long, so pairs can carry both
    val banded2 = banded.select(col("quarter"), col("qkey"),
      struct(col("id"), col("simhash")).as("m"))
    banded2
      .groupBy(col("quarter"), col("qkey"))
      .agg(collect_list(col("m")).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(filter(
        flatten(transform(col("members"), a =>
          transform(col("members"), b => struct(
            a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            a.getField("simhash").as("sig_a"), b.getField("simhash").as("sig_b"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.sig_a").as("sig_a"), col("p.sig_b").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // -------------------------------------------------------------------
  // Near-dup clustering (connected components over candidate pairs)
  // -------------------------------------------------------------------

  /** One-hop-only rounds before pointer doubling engages (see
    * [[clusterPairs]]): shallow clusters converge inside these without
    * paying the doubling self-join. */
  private val DoubleAfter = 8

  /** Connected components over an undirected pair set (id_a, id_b):
    * assigns every node the MIN id of its component — the canonical-doc
    * choice for a near-dup cluster. Min-label propagation WITH pointer
    * doubling: each round every node adopts the smallest label among
    * itself and its neighbors (one hop), and from round [[DoubleAfter]]
    * on additionally shortcuts to its label's label (roughly doubling
    * the effective propagation depth per round). With the defaults
    * (8 one-hop rounds, then 8 doubling rounds) components ~2,500 hops
    * deep converge; every extra `maxIters` step roughly doubles that
    * depth. The doubling self-join is deferred because real near-dup
    * clusters are almost always shallow: one-hop rounds converge them in
    * a few rounds and the extra |V| join was a measured 2.4x slowdown
    * on the sf0.1 bench; deep chains pay one extra round over pure
    * doubling, nothing more. A round that exhausts the valve without
    * converging THROWS rather than returning silently split clusters:
    * an under-merged component would pass unnoticed (dupes merely
    * survive) yet diverge from the true components — found by the r7
    * ScaleSpec 300-hop-chain pin (`ScaleSpec` "a 300-hop chain converges
    * within the default round valve") against the old one-hop/10-round
    * version, which quietly returned split clusters. Convergence that
    * lands EXACTLY on round `maxIters` is confirmed by one extra
    * zero-change verification round rather than reported as failure
    * (r7 ADVICE). Each round is one aggregation over the edge list plus
    * a |V|-row self-join; labels are checkpointed to keep plan depth
    * bounded.
    */
  /** Edge cap for the driver-local fast path (r17 optimization): an
    * edge list at or under this many DISTINCT undirected pairs is
    * collected (16 bytes/edge — ~4 MB at the default) and resolved with
    * one union-find pass instead of the iterative label-propagation
    * loop. Near-dup graphs are tiny relative to their corpus (pairs are
    * LSH-candidate-confirmed duplicates), so in practice every
    * micro-batch and most batch corpora take this path — the iterative
    * loop costs 2-4 Spark jobs PER ROUND (propagation + checkpoint),
    * ~10-20 jobs for a shallow graph, all scheduler overhead at micro-
    * batch sizes and still O(log diameter) barriers at corpus scale.
    * The distributed loop remains the path for genuinely large graphs.
    * Output is IDENTICAL (min-id label per component; union-by-min
    * keeps every root the component minimum, so no second pass is
    * needed) — parity is spec-pinned. */
  val DriverMaxEdges: Long = 1L << 18

  def clusterPairs(
      pairs: DataFrame, maxIters: Int = 16,
      driverMaxEdges: Long = DriverMaxEdges): DataFrame = {
    val spark = pairs.sparkSession
    import org.apache.spark.sql.functions.{min => fmin}
    // symmetric edge list + self-loops (keeps isolated-after-filter nodes)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()

    // DRIVER FAST PATH: the first job any round would run is the edge
    // materialization; riding a bounded count on it is free. At or
    // under the cap, collect and union-find — one job total instead of
    // rounds × (propagation + checkpoint) jobs.
    val nEdges = edges.count()
    if (nEdges <= 2 * driverMaxEdges) { // edges carries both directions
      val arr = edges.collect()
      edges.unpersist()
      val parent = new java.util.HashMap[Long, java.lang.Long](
        math.max(16, (arr.length * 2)))
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      var i = 0
      while (i < arr.length) {
        val a = arr(i).getLong(0); val b = arr(i).getLong(1)
        if (parent.get(a) == null) parent.put(a, a)
        if (parent.get(b) == null) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN id: the root of every tree is its component's
        // minimum at all times, so find(id) IS the cluster label
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
        i += 1
      }
      val out = new Array[org.apache.spark.sql.Row](parent.size())
      val it = parent.keySet().iterator()
      var j = 0
      while (it.hasNext) {
        val id = it.next()
        out(j) = org.apache.spark.sql.Row(id, find(id))
        j += 1
      }
      // LocalRelation (not an RDD-backed frame): the label table's size
      // is then statistics-known, so downstream joins broadcast it
      return spark.createDataFrame(
        java.util.Arrays.asList(out: _*),
        StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("cluster_id", LongType, nullable = false))))
    }

    // one propagation round: returns (new labels, #nodes whose label
    // changed). Each node takes min(own label, neighbors' labels). The
    // old label rides the aggregation (min ignores the neighbor rows'
    // nulls; every aggregated id exists in `labels`), so the changed-node
    // count comes out of the SAME job via `observe` — the former
    // left_anti + isEmpty probe cost one extra Spark job per round over
    // two checkpointed |V|-row frames.
    def round(labels: DataFrame, iter: Int): (DataFrame, Long) = {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"),
          lit(null).cast("long").as("__old"))
      val afterHop = labels.select(col("id"), col("label"), col("label").as("__old"))
        .unionByName(viaNeighbors)
        .groupBy("id").agg(fmin("label").as("label"), fmin("__old").as("__old"))
      // pointer doubling: label(id) := label(label(id)). Every label IS a
      // node id of the same component (labels start as ids and only move
      // down via min over seen ids), so the self-join resolves every row;
      // label(x) <= x makes the adopted label monotonically smaller.
      // This is what turns O(diameter) rounds into O(log diameter) —
      // engaged only once the cheap one-hop rounds have had their chance
      // (sf0.1 bench: one-hop converges in 7 rounds at 2.8 s; engaging
      // doubling before that cost 3.5-3.9 s for zero fewer rounds).
      val stepped =
        if (iter < DoubleAfter) afterHop
        else {
          val parents = afterHop
            .select(col("id").as("__pid"), col("label").as("__plabel"))
          afterHop
            .join(parents, col("label") === col("__pid"), "left")
            .select(col("id"),
              coalesce(col("__plabel"), col("label")).as("label"), col("__old"))
        }
      val obs = org.apache.spark.sql.Observation()
      val next = graft.ops.Checkpoints.pin(stepped
        .observe(obs, sum(when(col("label") =!= col("__old"), 1L).otherwise(0L))
          .as("changed"))
        .drop("__old"))
      val nChanged = obs.get("changed") match {
        case n: Long => n
        case null => 0L // empty pair set: no rows, no propagation
        case other => other.toString.toLong
      }
      (next, nChanged)
    }

    var labels = edges.select(col("src").as("id"), col("src").as("label"))
      .unionByName(edges.select(col("dst").as("id"), col("dst").as("label")))
      .groupBy("id").agg(fmin("label").as("label"))
    var changed = true
    var iter = 0
    while (changed && iter < maxIters) {
      val (next, nChanged) = round(labels, iter)
      labels = next
      changed = nChanged > 0
      iter += 1
    }
    if (changed) {
      // the valve round itself changed labels — but that change may have
      // BEEN the fixpoint (convergence exactly on round maxIters). One
      // unconditional verification round distinguishes the two: zero
      // changes proves convergence (and leaves the labels untouched);
      // any change is genuine non-convergence (r7 ADVICE — the old code
      // reported exact-on-valve convergence as failure).
      val (verified, nChanged) = round(labels, iter)
      if (nChanged > 0) {
        edges.unpersist()
        throw new IllegalStateException(
          s"clusterPairs did not converge in $maxIters rounds " +
            s"($DoubleAfter one-hop + ${maxIters - DoubleAfter} doubling; " +
            "covers components a few thousand hops deep at the defaults) — " +
            "raise maxIters: each extra round roughly doubles the covered depth")
      }
      labels = verified
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Full near-dup dedup: candidate pairs → clusters → keep one doc per
    * cluster (the min id); docs in no pair survive untouched. */
  def dedupNearByClusters(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = clusterPairs(pairs)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .filter(col("cluster_id").isNull || col(idCol) === col("cluster_id"))
      .drop("cluster_id")
  }

  /** Per-cluster WINNERS under a keep-best policy: for every near-dup
    * cluster (docs in no pair form singleton clusters of themselves),
    * the row maximizing `score`, ties broken toward the SMALLEST id —
    * production near-dedup keeps the best document of each duplicate
    * group (longest, highest quality score, earliest crawl), not an
    * arbitrary member. Output: (cluster_id, id, score) for each winner.
    *
    * The argmax is ONE combiner-backed aggregation —
    * `max(struct(score, -id))` orders by score then by min id — so the
    * popular clusters collapse map-side before the shuffle (no window
    * over the full corpus, no skew on giant duplicate groups). `score`
    * must be an orderable numeric column; ids must be nonnegative (the
    * tie-break negates them). */
  def clusterWinners(
      df: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame = {
    val clusters = clusterPairs(pairs)
    val scored = df
      .select(col(idCol), score.as("__score"))
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    scored.groupBy("cluster_id")
      .agg(max(struct(col("__score").as("s"), (-col(idCol)).as("negid"))).as("__w"))
      .select(col("cluster_id"), (-col("__w.negid")).as(idCol),
        col("__w.s").as("score"))
  }

  /** Full keep-best near-dup dedup: candidate pairs → clusters → keep the
    * highest-`score` doc per cluster (ties → min id); docs in no pair
    * survive untouched. Returns the surviving rows of `df` unchanged. */
  def dedupNearKeepBest(
      df: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame =
    df.join(clusterWinners(df, idCol, pairs, score).select(col(idCol)),
      Seq(idCol), "left_semi")

  // -------------------------------------------------------------------
  // Embedding near-dup (cosine)
  // -------------------------------------------------------------------

  /** Near-duplicate pairs by embedding cosine ≥ threshold, blocked by
    * random-hyperplane sign buckets (see [[graft.sim.Similarity]] for the
    * hyperplane machinery). Exact cosine runs only within buckets. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = graft.sim.Similarity.withHyperplaneBucket(df, vecCol, planes, seed)
    val a = bucketed.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = bucketed.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, "__bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", graft.sim.Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  // -------------------------------------------------------------------
  // Span-level (sub-document) dedup
  // -------------------------------------------------------------------

  /** Corpus-wide span dedup, the C4 move (Raffel et al. 2020 §2.2 dedups
    * three-sentence spans; reference corpus ops are doc-level only): each
    * document is cut into consecutive `spanTokens`-token windows, every
    * span keeps exactly its FIRST corpus occurrence (min (id, position)),
    * and documents are reassembled from their surviving spans in order.
    * Documents whose every span appeared earlier vanish entirely.
    *
    * Scale shape: the keep-decision is `groupBy(span).agg(min(struct(id,
    * idx)))` — partial map-side aggregation collapses the popular spans
    * (boilerplate is exactly the skewed key) before the shuffle, so the
    * exchange carries near-distinct spans; the rebuild shuffles surviving
    * spans once on the doc id. Two exchanges total, both combiner-backed —
    * never a window over raw text and never a self-join. */
  def dedupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens > 0, "spanTokens must be positive")
    val toks = TextOps.tokens(col(textCol))
    val nSpans = ceil(size(toks).cast("double") / spanTokens).cast("int")
    val spans = transform(
      sequence(lit(0), greatest(nSpans, lit(1)) - 1),
      i => concat_ws(" ", slice(toks, i * spanTokens + 1, lit(spanTokens))))
    docs.select(col(idCol), posexplode(spans).as(Seq("__idx", "__span")))
      .groupBy(col("__span"))
      .agg(min(struct(col(idCol).as("id"), col("__idx").as("idx"))).as("__first"))
      .select(col("__first.id").as(idCol), col("__first.idx").as("__idx"),
        col("__span"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__idx"), col("__span"))))
        .as("__spans"))
      .select(col(idCol),
        concat_ws(" ", transform(col("__spans"), s => s.getField("__span")))
          .as(textCol))
  }

  /** Intra-document repeated-line removal (C4's "deduplicate repeated
    * paragraphs within a page", Raffel et al. 2020 §2.2): within each
    * document, keep only the FIRST occurrence of every distinct line,
    * preserving original order. Unlike [[dedupSpans]] this never compares
    * lines ACROSS documents — navigation chrome repeated inside one page
    * goes, legitimate cross-page repetition stays.
    *
    * Scale shape: two shuffles, both with map-side partial aggregation —
    * (id, line) → min(pos), then id → ordered reassembly. Keyed by
    * (id, line) rather than folding a seen-set per document so a single
    * pathological page with millions of lines still distributes instead
    * of serializing into one task. */
  /** CROSS-document line scrub — the CCNet/RefinedWeb boilerplate
    * removal: lines whose DISTINCT-document frequency exceeds
    * `maxDocFreq` (navigation chrome, cookie banners, footers — content
    * that repeats across pages) are removed from EVERY document; the
    * survivors keep their original order. In-document repeats do not
    * inflate the frequency (it counts documents, not occurrences), so a
    * legitimately repeated refrain inside one doc survives.
    *
    * EMPTY lines are EXEMPT: a blank line is a paragraph separator, not
    * boilerplate — on a real corpus virtually every document has them,
    * so counting the empty line's document frequency would delete every
    * paragraph break corpus-wide (the empty-decontam-gram rule, one
    * operator over). They are kept verbatim and never enter the
    * frequency table.
    *
    * Shape at 100 TB: explode to (doc, pos, line) ONCE (pinned — the
    * explode+hash pass over the full corpus must not re-run for each of
    * its three consumers), shuffle on a TWO-LANE line fingerprint for
    * the exact distinct-doc count (never the line text — boilerplate
    * lines are megafrequency keys and the 16-byte key keeps the
    * exchange narrow), join the frequency back on the same key pair,
    * then one shuffle on the doc id to reassemble. Two lanes, not one:
    * `fingerprint64` alone is a base-31 polynomial mod 1e9+7 (~2^30
    * values), whose birthday bound (~30-50k distinct lines) is far
    * below corpus line counts — a collision would merge two different
    * lines' doc-frequencies and falsely scrub a unique line corpus-wide.
    * Pairing it with the independent xxhash64 lane pushes the collision
    * probability to ~2^-94 per pair (the exactDupGroups/dedupCatalog
    * two-lane discipline). Documents whose every line was scrubbed come
    * back EMPTY (kept, length 0) — the caller's length filter decides
    * their fate, not this operator.
    *
    * Returns `(idCol, textCol, n_lines_kept, n_lines_removed)`. */
  def dedupLinesAcross(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxDocFreq: Long = 1L): DataFrame = {
    require(maxDocFreq >= 1L, s"maxDocFreq must be >= 1: $maxDocFreq")
    val lines = graft.ops.Checkpoints.pin(
      docs.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .as(Seq("__pos", "__line")))
        .withColumn("__fp",
          graft.functions.GraftFunctions.fingerprint64(col("__line")))
        .withColumn("__fp2", xxhash64(col("__line"))))
    val freq = lines
      .filter(col("__line") =!= "") // paragraph separators are exempt
      .groupBy(col("__fp"), col("__fp2"))
      .agg(countDistinct(col(idCol)).as("__df"))
    val assembled = lines
      .join(freq, Seq("__fp", "__fp2"), "left")
      .filter(col("__line") === "" || col("__df") <= maxDocFreq)
      .groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(col("__pos"), col("__line"))))
          .as("__lines"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__lines"), l => l.getField("__line")))
          .as(textCol),
        size(col("__lines")).cast("long").as("n_lines_kept"))
    val totals = lines.groupBy(col(idCol))
      .agg((max(col("__pos")) + 1L).cast("long").as("__total"))
    totals.join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_removed"))
  }

  def dedupLinesWithin(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
        .as(Seq("__pos", "__line")))
    lines
      .groupBy(col(idCol), col("__line"))
      .agg(min(col("__pos")).as("__first"))
      .groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(col("__first"), col("__line"))))
          .as("__lines"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__lines"), l => l.getField("__line")))
          .as(textCol),
        size(col("__lines")).cast("long").as("n_lines_kept"))
  }
}
