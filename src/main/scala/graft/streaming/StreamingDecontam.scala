package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.ExactCatalog

/** STREAMING DECONTAMINATION — drop training documents that overlap a
  * registered benchmark/eval set (the n-gram contamination rule of
  * [[graft.text.TextOps.contaminationFlags]], as a persistent-catalog
  * streaming tier): a year-long curation stream must never train on
  * eval text, and the eval sets are known up front — so their distinct
  * NORMALIZED word-n-gram FINGERPRINTS live in an [[ExactCatalog]]-
  * delegated registry (`fp = fingerprint64(gram)`, `h2 = xxhash64(gram)`
  * — a false drop needs a simultaneous two-hash collision, the family
  * discipline) and every micro-batch probes it with the usual
  * bucket-pruned, key-pushed read.
  *
  * Grams are UNICODE-NORMALIZED on BOTH sides ([[graft.text.TextOps
  * .uniWordShingles]]: simple-mapping lowercase, letter/digit token
  * runs over ALL scripts, CJK characters as singleton tokens — the
  * GPT-3 appendix C / PaLM / Llama normalization widened past ASCII),
  * so a benchmark answer re-flowed as "the capital of france" cannot
  * evade a registry built from "The capital of France.", a Cyrillic
  * answer cannot evade by case-flipping, and a Chinese answer cannot
  * evade by punctuation reflow (per-character tokens make the window a
  * character shingle there). The v2 ASCII-only fold left fully
  * non-Latin eval text with ZERO grams — the registry silently
  * protected nothing outside English. The normalization is part of the
  * fingerprint UNIVERSE, so the kind carries a `_uni` marker and both
  * the v1 (raw-gram) and v2 (`_norm`, ASCII-fold) kinds refuse loudly
  * through the shared kind machinery instead of silently matching
  * nothing.
  *
  * Unlike the dedup tiers this catalog is READ-ONLY from the stream's
  * side: training batches never advance it (a training doc is not
  * benchmark text), new benchmarks are [[register]]ed out of band. That
  * makes the crash story trivial — the tier is a pure idempotent
  * filter; replays re-drop the same documents with no append ordering
  * to reason about.
  *
  * The n-gram width is a layout property exactly like the substring
  * tier's window (a 3-gram registry probed with 4-grams matches
  * nothing), carried in the kind and meta-authoritative after creation.
  */
object StreamingDecontam {

  val KindPrefix = "decontam_gram_n"
  val KindSuffix = "_uni" // normalization is a fingerprint-universe property
  def kindFor(n: Int): String = s"$KindPrefix$n$KindSuffix"

  /** The registry's recorded n-gram width (None: no registry, or not a
    * NORMALIZED decontam registry — a v1 raw-gram kind deliberately does
    * not parse, so the open falls through to the kind machinery's loud
    * refusal). Regex-parsed like [[graft.dedup.SubstrCatalog.metaW]]. */
  private val KindRe =
    (java.util.regex.Pattern.quote(KindPrefix) + """(\d+)""" +
      java.util.regex.Pattern.quote(KindSuffix)).r
  def metaN(spark: SparkSession, dir: String): Option[Int] =
    ExactCatalog.readMetaKind(spark, dir).collect {
      case KindRe(n) => n
    }.flatMap(_.toIntOption)

  /** `(id, fp, h2)` of a frame's distinct normalized n-grams — the probe
    * side's shingle pass, shared across registries of the same width.
    * The EMPTY gram is dropped on BOTH sides (here and [[evalEntriesOf]]):
    * a doc with ZERO normalized tokens (pure punctuation/symbols)
    * degrades to [""], and matching on "" would mark every such
    * training doc contaminated by every such eval doc — a pure false
    * positive carrying no shared content. Non-empty short-doc degrades
    * (the whole-token join) stay: an exact short eval answer should
    * still match. */
  private def gramsOf(batch: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    batch.select(col(idCol).as("id"),
      explode(graft.text.TextOps.uniWordShingles(col(textCol), n))
        .as("gram"))
      .filter(col("gram") =!= "")
      .select(col("id"),
        graft.functions.GraftFunctions.fingerprint64(col("gram")).as("fp"),
        xxhash64(col("gram")).as("h2"))

  /** Registry entries of an eval/benchmark frame: the distinct
    * normalized word n-grams' paired fingerprints (empty gram dropped —
    * see [[gramsOf]]). */
  def evalEntriesOf(evalDocs: DataFrame, textCol: String, n: Int): DataFrame =
    evalDocs
      .select(explode(graft.text.TextOps.uniWordShingles(col(textCol), n))
        .as("gram"))
      .filter(col("gram") =!= "")
      .distinct()
      .select(
        graft.functions.GraftFunctions.fingerprint64(col("gram")).as("fp"),
        xxhash64(col("gram")).as("h2"))

  /** Register a benchmark/eval set's n-grams (out-of-band — never from
    * the training stream). Layout parameters are CREATE-TIME defaults;
    * an existing registry's meta is authoritative. */
  def register(evalDocs: DataFrame, dir: String, textCol: String,
      n: Int = 3, numBuckets: Int = ExactCatalog.DefaultBuckets,
      added: Long = 0L): Unit = {
    val spark = evalDocs.sparkSession
    val effN = metaN(spark, dir).getOrElse(n)
    ExactCatalog.append(evalEntriesOf(evalDocs, textCol, effN), dir,
      ExactCatalog.readMeta(spark, dir).getOrElse(numBuckets), added,
      kind = kindFor(effN))
  }

  /** One-call registry MIGRATION for fingerprint-universe bumps (the
    * docs/MIGRATION.md v2→v3 runbook as an operation): a registry whose
    * recorded kind is not the CURRENT universe (v1 raw-gram, v2
    * ASCII-fold `_norm`, or any future stale marker) is rebuilt from
    * the eval corpus — the durable input; the registry is derived state
    * — into a sibling directory and swapped into place. Returns true
    * when a rebuild happened, false when the registry was already
    * current (idempotent — safe to run unconditionally on every
    * deploy). A missing/empty dir registers fresh.
    *
    * Operational contract: stop the stream at a trigger boundary, run
    * this once, resume from the SAME checkpoint — admission is
    * idempotent and the probe is stateless per trigger, so admitted
    * batches are unaffected (spec-pinned: stale-kind refusal → migrate
    * → green resume). The swap is delete-then-rename of the registry
    * dir; the stream is stopped per the contract, so no trigger can
    * observe the window between them. */
  def migrateRegistry(evalDocs: DataFrame, dir: String, textCol: String,
      n: Int = 3, numBuckets: Int = ExactCatalog.DefaultBuckets,
      added: Long = 0L): Boolean = {
    val spark = evalDocs.sparkSession
    if (metaN(spark, dir).isDefined) return false // already current
    if (ExactCatalog.readMetaKind(spark, dir).isEmpty) {
      // nothing (or kindless dir) there: plain fresh registration
      register(evalDocs, dir, textCol, n, numBuckets, added)
      return true
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".rebuild")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    register(evalDocs, tmp.toString, textCol, n, numBuckets, added)
    fs.delete(path, true)
    require(fs.rename(tmp, path),
      s"migrateRegistry: rename $tmp -> $path failed (old registry " +
        "already removed; rerun to re-register from the eval corpus)")
    true
  }

  /** One micro-batch against ONE registry — [[applyBatchMulti]] with a
    * single dir; see there for the semantics. */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, textCol: String,
      n: Int = 3, minHits: Long = 1L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame =
    applyBatchMulti(batch, Seq(dir), idCol, textCol, n, minHits,
      maxPushdownKeys, deliver)

  /** One micro-batch against SEVERAL registries in one pass: shingle
    * once per DISTINCT registered width (pinned — not once per
    * registry), probe each registry's catalog with its own pruned read,
    * and drop every doc sharing at least `minHits` DISTINCT n-grams with
    * ANY single registry (the [[graft.text.TextOps.contaminationFlags]]
    * rule at `minHits = 1`). Equivalent to applying the registries
    * sequentially — each tier is a pure filter, so sequential
    * application drops exactly the UNION of the per-registry drop sets
    * (spec-pinned) — but pays one shingle pass and one anti-join instead
    * of R of each. Pure filter — no append, no crash ordering (class
    * doc). An empty/missing registry passes everything (nothing
    * registered = nothing to leak); an empty `dirs` is the identity.
    *
    * The hit count joins against the registry's DISTINCT `(fp, h2)`
    * pairs: the catalog may hold duplicate rows (the same gram
    * registered by two eval sets, or a replayed register() before
    * compaction), and counting joined rows instead of distinct shared
    * grams would let one gram satisfy `minHits > 1` alone. */
  def applyBatchMulti(
      batch: DataFrame, dirs: Seq[String], idCol: String, textCol: String,
      n: Int = 3, minHits: Long = 1L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    require(minHits >= 1L, s"minHits must be >= 1: $minHits")
    if (dirs.isEmpty) { deliver(batch); return batch }
    val spark = batch.sparkSession
    val effNs = dirs.map(d => d -> metaN(spark, d).getOrElse(n))
    val gramsByN = effNs.map(_._2).distinct.map { en =>
      en -> graft.ops.Checkpoints.pin(gramsOf(batch, idCol, textCol, en))
    }.toMap
    val dropped = effNs.map { case (d, en) =>
      val grams = gramsByN(en)
      val cat = ExactCatalog.readForBatch(
        spark, d, grams.select(col("fp")), maxPushdownKeys,
        kind = kindFor(en))
      grams
        .join(cat.select(col("fp"), col("h2")).distinct(), Seq("fp", "h2"))
        .groupBy(col("id")).agg(count(lit(1)).as("__hits"))
        .filter(col("__hits") >= minHits)
        .select(col("id"))
    }.reduce(_ union _).distinct().select(col("id").as(idCol))
    val out = batch.join(dropped, Seq(idCol), "left_anti")
    deliver(out)
    out
  }
}
