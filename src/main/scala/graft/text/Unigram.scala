package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Distributed unigram-LM (SentencePiece-style) tokenizer trainer
  * (Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates") — the second
  * tokenizer-construction family beside [[Bpe]]: where BPE composes a
  * vocabulary bottom-up by merging, the unigram model starts from an
  * over-complete SUBSTRING candidate set and refines it with EM —
  * segment the corpus under the current piece probabilities, re-estimate
  * the probabilities from the segmentation, prune.
  *
  * This realization is one HARD-EM iteration with a VITERBI E-step
  * (the 1-best segmentation stands in for the posterior — hard EM is
  * the standard deterministic variant; soft expected counts would need
  * the forward-backward pass and its cross-engine floating-point
  * ordering is not oracle-statable), chosen so every stage is exactly
  * restatable in the DuckDB oracle:
  *
  *  1. SEED: every substring of length 1..[[MaxPieceLen]] of every word
  *     occurrence (words = lowercased whitespace tokens of length
  *     1..[[MaxWordLen]]; longer words are out of training scope, the
  *     SentencePiece max-sentencepiece-length discipline), counted —
  *     one explode + one shuffle. The seed vocabulary keeps ALL single
  *     characters (segmentation coverage) plus the top
  *     [[SeedMultiPieces]] multi-character candidates by (count DESC,
  *     piece ASC) — a deterministic total order.
  *  2. E-STEP: Viterbi-segment every DISTINCT word under seed
  *     log-probabilities `round(ln(cnt/total), 6)` (the corpus never
  *     re-scans — the word-frequency table carries occurrence weights,
  *     the [[Bpe]] Heaps'-law observation), via the codegen'd
  *     [[graft.functions.UnigramSegment]] kernel with the vocabulary as
  *     a bounded driver-collected expression constant.
  *  3. M-STEP + PRUNE: piece usage = Σ occurrence-weighted counts over
  *     the 1-best segmentations; the final vocabulary keeps all single
  *     characters plus the top [[FinalMultiPieces]] USED multi-character
  *     pieces by (usage DESC, piece ASC); final log-probabilities are
  *     add-one smoothed `round(ln((uses+1)/(total+|V|)), 6)` (single
  *     characters the segmentation never chose must keep finite mass —
  *     encode needs them as the coverage fallback).
  *
  * Scale shape: two scans of the word-frequency table + three small
  * shuffles; the only driver state is the vocabulary itself (≤ singles
  * + [[SeedMultiPieces]] rows — the argmax/limit(1) discipline). */
object Unigram {

  val MaxPieceLen = 4
  val MaxWordLen = 12
  val SeedMultiPieces = 500
  val FinalMultiPieces = 200

  /** The trained vocabulary as bounded driver state, for [[encode]]. */
  final case class Vocab(pieces: Array[String], logps: Array[Double])

  /** Word-frequency table: (w, occ) — lowercased whitespace tokens of
    * length 1..[[MaxWordLen]], with occurrence counts. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("occ"))

  /** Candidate piece counts: every substring of length 1..
    * [[MaxPieceLen]], weighted by word occurrences → (piece, cnt). */
  def seedCounts(words: DataFrame): DataFrame =
    words
      .select(col("w"), col("occ"),
        explode(sequence(lit(1), length(col("w")))).as("s"))
      .select(col("w"), col("occ"), col("s"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("s") + col("l") <= length(col("w")) + 1)
      .select(expr("substring(w, s, l)").as("piece"), col("occ"))
      .groupBy(col("piece")).agg(sum(col("occ")).as("cnt"))

  /** Seed vocabulary: all single characters + top multi-character
    * candidates, deterministic total order. */
  def seedVocab(cnts: DataFrame): DataFrame =
    cnts.filter(length(col("piece")) === 1)
      .unionByName(
        cnts.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece").asc)
          .limit(SeedMultiPieces))

  /** Collect a (piece, cnt) frame into a [[Vocab]] with
    * `logp = round(ln(cnt/total), 6)` — bounded driver state. */
  private def collectVocab(vocab: DataFrame, cntCol: String): Vocab = {
    val totalRow = vocab.agg(sum(col(cntCol))).head
    // sum() over zero rows is NULL — surface "nothing to train on"
    // instead of an opaque NPE (the Layout.quantileBounds discipline)
    require(!totalRow.isNullAt(0),
      "unigram trainer: no words to train on (empty or whitespace-only corpus)")
    val total = totalRow.getLong(0)
    val rows = vocab
      .select(col("piece"),
        round(log(col(cntCol).cast("double") / lit(total.toDouble)), 6)
          .as("logp"))
      .orderBy(col("piece"))
      .collect()
    Vocab(rows.map(_.getString(0)), rows.map(_.getDouble(1)))
  }

  private def segmentCol(c: Column, v: Vocab): Column =
    GraftFunctions.unigramSegment(c, v.pieces.toSeq, v.logps.toSeq)

  /** Piece usage under the seed model's Viterbi segmentations:
    * (piece, n_uses), occurrence-weighted. Words only segment over the
    * seed vocabulary (all corpus characters are in it, so nothing is
    * unsegmentable in-corpus). */
  private def usageCounts(words: DataFrame, seed: Vocab): DataFrame =
    words
      .select(col("occ"), explode(segmentCol(col("w"), seed)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("occ")).as("n_uses"))

  /** The trained vocabulary as a DataFrame: (piece, n_uses, logp) —
    * the `unigram_train` surface. */
  def train(df: DataFrame, textCol: String): DataFrame = {
    val words = graft.ops.Checkpoints.pin(wordTable(df, textCol))
    val seedDf = seedVocab(seedCounts(words))
    val seed = collectVocab(seedDf, "cnt")
    val usage = usageCounts(words, seed)
    val finals = finalVocabDf(seedDf, usage)
    // add-one smoothing over the FINAL vocabulary: uses can be 0 for a
    // single char the 1-best segmentations never chose
    val totals = finals.agg(
      sum(col("n_uses")).as("tot"), count(lit(1)).as("v"))
    finals.crossJoin(broadcast(totals))
      .select(col("piece"), col("n_uses"),
        round(log((col("n_uses") + lit(1L)).cast("double") /
          (col("tot") + col("v")).cast("double")), 6).as("logp"))
  }

  /** Final vocabulary rows (piece, n_uses): all single characters
    * (unused ones at 0) + top USED multi-character pieces. */
  private def finalVocabDf(seedDf: DataFrame, usage: DataFrame): DataFrame =
    seedDf.filter(length(col("piece")) === 1).select(col("piece"))
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
      .unionByName(
        usage.filter(length(col("piece")) > 1 && col("n_uses") > 0)
          .orderBy(col("n_uses").desc, col("piece").asc)
          .limit(FinalMultiPieces))

  /** Train and collect the final vocabulary (bounded: singles +
    * [[FinalMultiPieces]] rows) for [[encode]]. The logps are the SAME
    * smoothed values [[train]] emits — collected from the same frame. */
  def trainedVocab(df: DataFrame, textCol: String): Vocab = {
    val t = train(df, textCol).select(col("piece"), col("logp"))
      .orderBy(col("piece")).collect()
    Vocab(t.map(_.getString(0)), t.map(_.getDouble(1)))
  }

  /** Encode every document against a trained vocabulary:
    * (idCol, piece, n, is_unk) — Viterbi pieces for words within
    * [[MaxWordLen]], the whole word as a single `is_unk` row for longer
    * words (and, defensively, for unsegmentable ones — impossible when
    * encoding the training corpus, whose every character is a
    * single-char piece). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Vocab): DataFrame = {
    val words = df
      .select(col(idCol), explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) >= 1)
      .withColumn("__seg",
        when(length(col("w")) <= MaxWordLen, segmentCol(col("w"), vocab)))
    val pieces = words
      .filter(col("__seg").isNotNull)
      .select(col(idCol), explode(col("__seg")).as("piece"),
        lit(false).as("is_unk"))
    val unks = words
      .filter(col("__seg").isNull)
      .select(col(idCol), col("w").as("piece"), lit(true).as("is_unk"))
    pieces.unionByName(unks)
      .groupBy(col(idCol), col("piece"), col("is_unk"))
      .agg(count(lit(1)).as("n"))
  }
}
