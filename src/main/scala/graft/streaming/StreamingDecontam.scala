package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.ExactCatalog

/** STREAMING DECONTAMINATION — drop training documents that overlap a
  * registered benchmark/eval set (the n-gram contamination rule of
  * [[graft.text.TextOps.contaminationFlags]], as a persistent-catalog
  * streaming tier): a year-long curation stream must never train on
  * eval text, and the eval sets are known up front — so their distinct
  * word-n-gram FINGERPRINTS live in an [[ExactCatalog]]-delegated
  * registry (`fp = fingerprint64(gram)`, `h2 = xxhash64(gram)` — a
  * false drop needs a simultaneous two-hash collision, the family
  * discipline) and every micro-batch probes it with the usual
  * bucket-pruned, key-pushed read.
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
  def kindFor(n: Int): String = s"$KindPrefix$n"

  /** The registry's recorded n-gram width (None: no registry, or not a
    * decontam registry). Regex-parsed like [[graft.dedup.SubstrCatalog
    * .metaW]] — malformed tags fall through to the kind machinery's
    * loud refusal. */
  private val KindRe =
    (java.util.regex.Pattern.quote(KindPrefix) + """(\d+)""").r
  def metaN(spark: SparkSession, dir: String): Option[Int] =
    ExactCatalog.readMetaKind(spark, dir).collect {
      case KindRe(n) => n
    }.flatMap(_.toIntOption)

  /** Registry entries of an eval/benchmark frame: the distinct word
    * n-grams' paired fingerprints. */
  def evalEntriesOf(evalDocs: DataFrame, textCol: String, n: Int): DataFrame =
    evalDocs
      .select(explode(graft.text.TextOps.wordShingles(col(textCol), n))
        .as("gram"))
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

  /** One micro-batch against the registry: shingle once (pinned), drop
    * every doc sharing at least `minHits` distinct n-grams with the
    * registered eval sets (the [[graft.text.TextOps.contaminationFlags]]
    * rule at `minHits = 1`), deliver the survivors. Pure filter — no
    * append, no crash ordering (see class doc). An empty/missing
    * registry passes everything (nothing registered = nothing to leak). */
  def applyBatch(
      batch: DataFrame, dir: String, idCol: String, textCol: String,
      n: Int = 3, minHits: Long = 1L,
      maxPushdownKeys: Int = ExactCatalog.DefaultMaxPushdownKeys,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    require(minHits >= 1L, s"minHits must be >= 1: $minHits")
    val spark = batch.sparkSession
    val effN = metaN(spark, dir).getOrElse(n)
    val grams = graft.ops.Checkpoints.pin(
      batch.select(col(idCol).as("id"),
        explode(graft.text.TextOps.wordShingles(col(textCol), effN))
          .as("gram"))
        .select(col("id"),
          graft.functions.GraftFunctions.fingerprint64(col("gram")).as("fp"),
          xxhash64(col("gram")).as("h2")))
    val cat = ExactCatalog.readForBatch(
      spark, dir, grams.select(col("fp")), maxPushdownKeys,
      kind = kindFor(effN))
    val dropped = grams
      .join(cat.select(col("fp"), col("h2")), Seq("fp", "h2"))
      .groupBy(col("id")).agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") >= minHits)
      .select(col("id").as(idCol))
    val out = batch.join(dropped, Seq(idCol), "left_anti")
    deliver(out)
    out
  }
}
