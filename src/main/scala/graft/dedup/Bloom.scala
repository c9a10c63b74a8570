package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BloomKernels, BloomMightContain, GraftFunctions}

/** Bloom-prefiltered incremental dedup — the crawl-vs-catalog shape when
  * the catalog no longer fits a broadcast join and a full shuffle of the
  * new crawl against it is the bottleneck:
  *
  *  1. BUILD once per catalog epoch: one scan of the catalog's (fp, h2)
  *     keys folds into a fixed-size bit array via `treeAggregate`
  *     (per-partition local blooms, OR-merged up a tree — driver receives
  *     log(P) arrays, not rows).
  *  2. PREFILTER: the new crawl probes the bloom INSIDE the scan (codegen
  *     expression, no join, no shuffle). A negative is definitely new —
  *     at a 1% false-positive rate, ~99% of genuinely-new docs skip the
  *     join entirely.
  *  3. VERIFY: only bloom-positives anti-join the catalog — the shuffle
  *     carries FP-rate × new + true-dup rows instead of the whole crawl.
  *
  * The result is SET-IDENTICAL to [[Dedup.dedupIncremental]] (Bloom
  * filters have no false negatives — pinned in BloomSpec); only the data
  * volume reaching the shuffle changes. Deterministic: the bit array is a
  * pure function of the catalog key set.
  */
object Bloom {

  /** An immutable built filter. `numBits` is word-aligned; `k` probes. */
  final case class Filter(numBits: Int, k: Int, bits: Array[Long]) {
    def mightContain(c: Column): Column =
      org.apache.spark.sql.GraftColumnShim.column(
        BloomMightContain(
          org.apache.spark.sql.GraftColumnShim.expression(c), numBits, k, bits))
  }

  /** The 64-bit key hash both sides probe with: xxhash64 over the
    * catalog's (fp, h2) pair. */
  def keyHash(fp: Column, h2: Column): Column = xxhash64(fp, h2)

  /** Build a filter over a Long hash column sized for `expectedN` keys at
    * `fpp`. One distributed pass; driver memory = one bit array. */
  def build(hashes: DataFrame, hashCol: String,
      expectedN: Long, fpp: Double = 0.01): Filter = {
    val numBits = BloomKernels.optimalBits(math.max(expectedN, 1L), fpp)
    val k = BloomKernels.optimalK(numBits, math.max(expectedN, 1L))
    val words = numBits / 64
    val bits = hashes.select(col(hashCol).cast("long")).rdd
      .treeAggregate(new Array[Long](words))(
        seqOp = (acc, row) => { BloomKernels.insert(acc, numBits, k, row.getLong(0)); acc },
        combOp = (a, b) => BloomKernels.or(a, b))
    Filter(numBits, k, bits)
  }

  /** Incremental exact dedup with a bloom prefilter over the catalog —
    * same contract and result set as [[Dedup.dedupIncremental]]. Pass the
    * catalog row count if known (saves a count job). */
  def dedupIncrementalBloom(
      newDocs: DataFrame, catalog: DataFrame, idCol: String, textCol: String,
      secondKey: Column => Column = identity,
      catalogN: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    val n = catalogN.getOrElse(catalog.count())
    val filter = build(
      catalog.select(keyHash(col("fp"), col("h2")).as("__h")), "__h", n, fpp)

    val fresh = Dedup.dedupExact(newDocs, idCol, textCol)
      .withColumn("__fp", GraftFunctions.fingerprint64(col(textCol)))
      .withColumn("__h2", secondKey(col(textCol)))
      .withColumn("__maybe", filter.mightContain(keyHash(col("__fp"), col("__h2"))))

    val definiteNew = fresh.filter(!col("__maybe"))
    val survivors = fresh.filter(col("__maybe"))
      .join(catalog.select(col("fp").as("__cfp"), col("h2").as("__ch2")),
        col("__fp") === col("__cfp") && col("__h2") === col("__ch2"), "left_anti")
    definiteNew.unionByName(survivors).drop("__fp", "__h2", "__maybe")
  }
}
