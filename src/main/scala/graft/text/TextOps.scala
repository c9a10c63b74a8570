package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprinting.
  *
  * All built from codegen'd `org.apache.spark.sql.functions` higher-order
  * functions — no UDFs — so they inline into whole-stage codegen and scale
  * linearly with the scan: no shuffle is introduced by any scalar op here.
  */
object TextOps {

  /** Whitespace tokenization; empty/blank text → empty array. A single
    * codegen'd byte scan ([[graft.functions.TextKernels.tokenizeWs]])
    * with EXACT `split(trim(text), "\\s+")` parity — Spark's regex split
    * recompiles the pattern per row, which dominates the scan at corpus
    * scale (parity is ScalaCheck-pinned in TextExprsSpec). */
  def tokens(text: Column): Column = graft.functions.GraftFunctions.tokenizeWs(text)

  /** Token count without materializing the token array. */
  def tokenCount(text: Column): Column =
    graft.functions.GraftFunctions.tokenCountWs(text)

  /** BPE-ish subword count estimate: words + punctuation chars counted
    * separately (a cheap stand-in for a real tokenizer's fertility). */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) +
      graft.functions.GraftFunctions
        .countAsciiClass(text, ".,!?;:'\"()[]{}").cast(IntegerType)

  /** Character n-gram shingles (distinct), the MinHash input. One pass via
    * sequence+transform; distinct via array_distinct. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** Word n-gram shingles (distinct, first-occurrence order) — one byte
    * scan, no token/gram intermediate arrays (kernel parity with the
    * transform/array_distinct formulation pinned in TextExprsSpec). */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.wordNgrams(text, n, distinct = true)

  /** NORMALIZED word n-gram shingles — the DECONTAMINATION shingle:
    * tokens are maximal ASCII-alphanumeric runs, lowercased, so case and
    * punctuation reflows ("The capital of France." vs "the capital of
    * france") fingerprint identically on both the register and probe
    * sides (the GPT-3/PaLM/Llama normalization discipline; see
    * [[graft.functions.TextKernels.normWordNgrams]] for the exact byte
    * contract and its oracle restatement). */
  def normWordShingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.normWordNgrams(text, n, distinct = true)

  /** UNICODE-normalized word n-gram shingles — the MULTILINGUAL
    * decontamination shingle: tokens are maximal letter/digit code-point
    * runs (all scripts, not just ASCII) folded through the simple
    * per-code-point lowercase mapping, with Han/Hiragana/Katakana/Hangul
    * characters as singleton tokens (character shingles for the scripts
    * that write without word separators). Identical to
    * [[normWordShingles]] on pure-ASCII text; see
    * [[graft.functions.TextKernels.uniWordNgrams]] for the exact
    * contract and its DuckDB restatement. */
  def uniWordShingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.uniWordNgrams(text, n, distinct = true)

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1 quality
    * filters): the fraction of duplicated tokens / word n-grams inside a
    * document. High values mark boilerplate and degenerate generations.
    * Pure column expressions — zero shuffles, whole-stage codegen. */
  def repeatedTokenRatio(text: Column): Column = {
    val total = tokenCount(text)
    when(total <= 0, lit(0.0)).otherwise(
      round(lit(1.0) - graft.functions.GraftFunctions
        .distinctTokenCountWs(text).cast("double")
        / total.cast("double"), 6))
  }

  /** Duplicate word-n-gram fraction: 1 − distinct/total n-grams
    * (0 when the doc has < n tokens). Both counts are single byte scans —
    * no token array, no gram array, no per-row regex. */
  def repeatedNgramRatio(text: Column, n: Int): Column = {
    val total = tokenCount(text) - (n - 1)
    when(total <= 0, lit(0.0)).otherwise(
      round(lit(1.0) - graft.functions.GraftFunctions
        .distinctNgramCountWs(text, n).cast("double")
        / total.cast("double"), 6))
  }

  /** Decontamination (train/eval overlap): count per train document of
    * DISTINCT UNICODE-NORMALIZED word n-grams ([[uniWordShingles]] —
    * lowercase, punctuation-stripped, all scripts, the published
    * decontamination discipline) that also occur anywhere in the eval
    * corpus — the standard n-gram membership test for benchmark leakage,
    * robust to case/punctuation reflows of the eval text in ANY
    * language, not just ASCII English.
    *
    * Shape at 100 TB: the eval side collapses to its distinct gram set
    * (eval corpora are small — benchmarks, held-out splits) and
    * BROADCASTS; the train side explodes its distinct grams and
    * aggregates the hit count per doc. One map-side broadcast semi-match
    * + one shuffle on the doc id, never an all-pairs join. Returns
    * (idCol, n_shared_grams > 0 rows only).
    */
  def contaminationFlags(
      train: org.apache.spark.sql.DataFrame,
      eval: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    // the empty gram is dropped on both sides: a zero-normalized-token
    // doc (pure punctuation / symbols) degrades to [""], and matching
    // on "" would flag every such pair — no shared content
    val evalGrams = eval
      .select(explode(uniWordShingles(col(textCol), n)).as("gram"))
      .filter(col("gram") =!= "")
      .distinct()
    val trainGrams = train
      .select(col(idCol), explode(uniWordShingles(col(textCol), n)).as("gram"))
      .filter(col("gram") =!= "")
    trainGrams
      .join(org.apache.spark.sql.functions.broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Punctuation character class — deliberately simple and documented so
    * the DuckDB oracle can restate it verbatim. */
  val PunctClass = "[.,!?;:]"

  /** Punctuation ratio: punctuation chars / total chars (0 for empty).
    * Counted with the regex-strip length delta (one codegen'd
    * regexp_replace, no array materialization). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      graft.functions.GraftFunctions.countAsciiClass(text, ".,!?;:")
        .cast(DoubleType) / n.cast(DoubleType))
  }

  /** Stopword ratio over a fixed (deterministic, documented) list. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "was", "at", "by", "be")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isInCollection(Stopwords))).cast(DoubleType)
        / size(toks).cast(DoubleType))
  }

  /** Mean token length in characters (0 for empty text) — two
    * allocation-free scans, no token array. */
  def meanTokenLen(text: Column): Column = {
    val total = tokenCount(text)
    when(total === 0, lit(0.0)).otherwise(
      graft.functions.GraftFunctions.sumTokenCharsWs(text).cast(DoubleType)
        / total.cast(DoubleType))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation noise and a natural stopword rate. Deterministic linear
    * blend — the point is a reproducible scalar pipeline, not linguistics.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast(DoubleType) / lit(100.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(greatest(lit(0.0),
      lenScore * 0.5 + stopScore * 0.3 - punctPenalty * 0.2 + lit(0.2)), 6)
  }

  /** Replace emails, phone numbers and IPv4 addresses with sentinels —
    * the curation pipeline's PII pass; pure scalar, stays in the scan.
    * Delegates to [[Pii]], the canonical redaction module (r16
    * unification — this alias keeps the original call sites
    * source-compatible; the fixed order and pattern discipline live
    * there). */
  def scrubPii(text: Column): Column = Pii.scrub(text)

  /** Deterministic content-hash sampling: keep a row iff
    * fingerprint64(text) mod `outOf` < `keep`. Reproducible across runs,
    * partitionings and engines (unlike `df.sample`, whose RNG depends on
    * partition layout) — the right shape for train/eval splits and
    * ablation subsets at corpus scale. */
  def deterministicSampleFilter(text: Column, keep: Int, outOf: Int): Column =
    graft.functions.GraftFunctions.fingerprint64(text) % outOf < keep

  /** Weighted mixture sampling: per-source keep rates in permille, applied
    * through the same content-hash gate as [[deterministicSampleFilter]] —
    * the standard way to hit target corpus proportions (up-weight books,
    * down-weight web) while staying reproducible across partitionings and
    * reruns. Unknown sources fall back to `defaultPermille`.
    *
    * The rate table is a mixture CONFIG (tens of sources), so it inlines as
    * a codegen'd CASE chain — no join, no shuffle, pure scan. */
  def weightedSampleFilter(
      source: Column, text: Column,
      permille: Map[String, Int], defaultPermille: Int): Column = {
    require((defaultPermille +: permille.values.toSeq)
      .forall(p => p >= 0 && p <= 1000), "permille rates must be in [0, 1000]")
    val rate = permille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (src, p)) => when(source === src, lit(p)).otherwise(acc)
    }
    graft.functions.GraftFunctions.fingerprint64(text) % 1000 < rate
  }

  /** Per-source row counts, collected driver-side — the mixture-rate
    * input. Bounded by the number of SOURCES (a mixture config is tens of
    * entries), not rows; one map-side-combined shuffle on the source key.
    */
  def sourceCounts(df: org.apache.spark.sql.DataFrame,
      sourceCol: String): Map[String, Long] =
    df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Temperature-scaled mixture rates (the multilingual-LM sampling
    * knob — XLM/mT5 style): natural source shares pₛ = nₛ/N flatten to
    * qₛ ∝ pₛ^α, α ∈ (0, 1] (α = 1 keeps natural proportions, α → 0
    * approaches uniform), realized as per-source KEEP rates normalized so
    * the smallest source keeps everything:
    * rateₛ = max(1, ⌊1000·(n_min/nₛ)^(1−α)⌋) permille.
    *
    * Exponent 0.5 (α = 0.5, the common default) routes through
    * `math.sqrt` — correctly rounded per IEEE-754, so the DuckDB oracle
    * reproduces the permilles BITWISE from the same integer counts.
    * Other exponents use `math.pow` (not correctly-rounded by spec; a
    * cross-engine one-ulp difference only matters if 1000·x lands within
    * an ulp of an integer). The floor keeps every rate ≥ 1‰ so no source
    * is ever silenced entirely. */
  def temperatureMixPermille(
      counts: Map[String, Long], alpha: Double): Map[String, Int] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "counts must be non-empty and positive")
    val nMin = counts.values.min.toDouble
    val exp = 1.0 - alpha
    counts.map { case (s, n) =>
      val ratio = nMin / n.toDouble
      val scaled =
        if (exp == 0.5) 1000.0 * math.sqrt(ratio)
        else 1000.0 * math.pow(ratio, exp)
      s -> math.max(1, math.floor(scaled).toInt)
    }
  }

  /** Temperature mixture sampling end to end: counts → flattened rates →
    * the deterministic content-hash gate ([[weightedSampleFilter]]).
    * Counts are ONE bounded aggregate; the filter itself is a pure scan.
    */
  def temperatureMixFilter(
      df: org.apache.spark.sql.DataFrame, sourceCol: String,
      textCol: String, alpha: Double): Column = {
    val counts = sourceCounts(df, sourceCol)
    // a NULL source would poison the mixture both ways at once: its
    // count would drive n_min (collapsing every real source's rate)
    // while the generated `source === null` branch never matches, so
    // null rows would sail through at the default rate — fail loudly
    // instead of flattening wrong
    require(!counts.contains(null),
      s"temperature mixing over '$sourceCol' found NULL source values; " +
        "fill or filter them first")
    weightedSampleFilter(col(sourceCol), col(textCol),
      temperatureMixPermille(counts, alpha), defaultPermille = 1000)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    * hash every k-char window, then keep the MINIMUM hash of each run of
    * `w` consecutive window hashes. The selected set is position-robust —
    * any shared substring of length ≥ k + w − 1 guarantees a shared
    * fingerprint — which whole-document hashing cannot give. Ties select
    * by value alone (the set of selected values is identical either way;
    * only positions differ, and this returns the distinct value set).
    *
    * Pure column expression: O(len·k) hashing + O(len·w) window minima in
    * one codegen'd scan, no shuffle. Texts shorter than k yield the hash
    * of the whole text. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, "k and w must be positive")
    val hashes = when(length(text) < k,
        array(graft.functions.GraftFunctions.fingerprint64(text)))
      .otherwise(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => graft.functions.GraftFunctions.fingerprint64(text.substr(i, lit(k)))))
    // Bind the hash array ONCE per row: the minima expression references
    // it from INSIDE a higher-order-function lambda, and Spark performs
    // no common-subexpression elimination across HOF boundaries —
    // inlining `hashes` re-evaluated the whole O(len·k) hashing pass per
    // window position (O(len²·k) per row; measured 68 s for the sf0.01
    // gate, ~1 s bound). A one-element transform makes it the lambda
    // ARGUMENT, evaluated exactly once; same values, same null shape.
    element_at(
      transform(array(hashes), h =>
        array_distinct(
          when(size(h) <= w, array(array_min(h)))
            .otherwise(transform(
              sequence(lit(1), size(h) - (w - 1)),
              j => array_min(slice(h, j, lit(w))))))),
      1)
  }

  /** Gopher-style heuristic document filters (Rae et al. 2021, §A1.1),
    * the deliberately-portable subset: every signal is restatable in
    * DuckDB SQL so the whole rule bundle is oracle-checkable.
    *
    *  - n_tokens in [minTokens, maxTokens]
    *  - mean token length in [3, 10] chars
    *  - symbol ratio (# and … occurrences / tokens) ≤ 0.1
    *  - repeated-token ratio ≤ 0.3 (duplicate-token fraction)
    *  - at least 2 distinct stopwords present
    *
    * Pure scalar expressions — zero shuffles; returns the per-rule
    * booleans plus the conjunction so corpus diagnostics can aggregate
    * per-rule drop rates. */
  def gopherFlags(text: Column, minTokens: Int = 5, maxTokens: Int = 100000): Column = {
    val n = tokenCount(text)
    val mtl = meanTokenLen(text)
    val symbols = graft.functions.GraftFunctions.countSubstr(text, lit("#")) +
      graft.functions.GraftFunctions.countSubstr(text, lit("..."))
    val lowered = lower(text)
    val stopHits = Stopwords.map(w =>
      when(graft.functions.GraftFunctions
        .countSubstr(concat(lit(" "), lowered, lit(" ")), lit(s" $w ")) > 0, 1)
        .otherwise(0)).reduce(_ + _)
    val lengthOk = n >= minTokens && n <= maxTokens
    val mtlOk = mtl >= 3.0 && mtl <= 10.0
    val symbolOk = when(n === 0, lit(false))
      .otherwise(symbols.cast(DoubleType) / n.cast(DoubleType) <= 0.1)
    val repOk = repeatedTokenRatio(text) <= 0.3
    val stopOk = stopHits >= 2
    struct(
      lengthOk.as("length_ok"), mtlOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"), repOk.as("repetition_ok"),
      stopOk.as("stopword_ok"),
      (lengthOk && mtlOk && symbolOk && repOk && stopOk).as("keep"))
  }

  /** Token-count histogram bucket: floor(n_tokens / width), capped at
    * `maxBucket` — corpus length-distribution stats in one aggregation. */
  def tokenHistogramBucket(text: Column, width: Int, maxBucket: Int): Column =
    least(floor(tokenCount(text) / width), lit(maxBucket)).cast("long")

  /** Language-marker word lists for the n-gram/stopword language-ID
    * heuristic. Occurrence counting is done with the portable
    * "length delta / marker length" trick, so the DuckDB oracle can
    * reproduce it exactly. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "fr" -> Seq(" le ", " et ", " la ", " est "),
    "es" -> Seq(" el ", " y ", " la ", " es "),
    "zh" -> Seq("的", "是", "了", "在"))

  private def occurrences(hay: Column, needle: String): Column =
    graft.functions.GraftFunctions.countSubstr(hay, lit(needle))

  /** Predicted language = argmax of marker occurrences; ties and all-zero
    * scores fall back to "und" (deterministic: first max in list order). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = LangMarkers.map { case (lang, markers) =>
      val score = markers.map(m => occurrences(padded, m)).reduce(_ + _)
      struct(score.cast(LongType).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct orders lexicographically by (score, lang); to make
    // ties resolve by list order instead, tag with a priority index.
    val tagged = LangMarkers.zipWithIndex.map { case ((lang, markers), idx) =>
      val score = markers.map(m => occurrences(padded, m)).reduce(_ + _)
      struct(score.cast(LongType).as("score"),
        lit(LangMarkers.size - idx).as("prio"), lit(lang).as("lang"))
    }
    val best = array_max(array(tagged: _*))
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }
}
