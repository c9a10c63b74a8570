package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model operators for training-data curation:
  * a frequency-ranked vocabulary with token-id encoding (the tokenizer-
  * building step of a data pipeline) and a unigram-LM surprisal score
  * (the KenLM-style perplexity quality filter, reduced to its unigram
  * core so it stays exactly oracle-checkable).
  *
  * Scale notes (100 TB): token counting is one shuffle on the word key
  * with map-side combine; the vocabulary is a bounded top-V selection
  * (sort + limit over the aggregated counts — |vocab| rows, not |tokens|),
  * so the id-assignment window only ever sees ≤ V rows and the encode
  * join broadcasts the V-row vocabulary. The surprisal join shuffles on
  * the word key instead (the full vocabulary may exceed broadcast range);
  * both avoid any driver-side materialization.
  */
object LanguageModel {

  /** Top-`maxVocab` corpus words by (count desc, word asc), assigned
    * dense token ids 1..V in rank order. Id 0 is reserved for OOV.
    *
    * The row_number window is NOT a global sort of the vocabulary: its
    * input is the already-limited top-V frame, so the single-partition
    * window sees ≤ maxVocab rows by construction. */
  def vocabulary(df: DataFrame, textCol: String, maxVocab: Int): DataFrame = {
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("word")).limit(maxVocab)
    top.withColumn("token_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("word"))))
      .select(col("word"), col("token_id"))
  }

  /** Encode every document as its token-id sequence against the
    * frequency-ranked vocabulary: `ids_csv` is the comma-joined id
    * sequence in document order (portable across engines, unlike nested
    * array columns), with `n_tokens` and the OOV count alongside.
    * Order within a document is restored by sorting the collected
    * (position, id) pairs — no assumption about aggregation order. */
  def encodeDocs(
      df: DataFrame, idCol: String, textCol: String, maxVocab: Int): DataFrame = {
    val v = vocabulary(df, textCol, maxVocab)
    val toks = df.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "word")))
    toks
      .join(broadcast(v), Seq("word"), "left_outer")
      .withColumn("tid", coalesce(col("token_id"), lit(0)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === 0, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
            p => p.getField("tid").cast("string"))).as("ids_csv"))
  }

  /** Unigram-LM surprisal per document: the average negative log
    * probability of the document's tokens under the corpus unigram
    * distribution — the unigram core of the KenLM perplexity quality
    * filter (low = stereotypical text, high = rare-word-heavy / noise).
    *
    * Counts and the total are exact integers; `cnt/tot` is one double
    * division per distinct word, so the only float accumulation is the
    * final average, rounded to 6 places on both engines. */
  /** Interpolated BIGRAM surprisal — the KenLM/CCNet-style perplexity
    * quality filter one order up from [[unigramSurprisal]]: each
    * in-document transition (w_{i-1}, w_i) scores
    * `-ln(λ·p(w_i|w_{i-1}) + (1-λ)·p(w_i))` with corpus-MLE
    * probabilities. Self-scoring the counted corpus means every scored
    * n-gram has a positive count, so MLE is exact and the interpolation
    * IS the smoothing. Documents with < 2 tokens carry no transition and
    * produce no row.
    *
    * Scale: transition pairs come straight off the token array (no
    * window, no self-join); bigram/unigram counting is one combiner-
    * backed shuffle each; scoring joins shuffle on those keys (vocabulary
    * scale — deliberately never broadcast). The only float accumulation
    * is the final average, rounded to 6 dp — the same engine-exactness
    * contract as the unigram filter. λ defaults to 0.75 (binary-exact, so
    * both engines compute bit-identical interpolants). */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    val ws = TextOps.tokens(col(textCol))
    val nPairs = greatest(size(ws) - 1, lit(0))
    val pairs = df.select(col(idCol),
      explode(zip_with(
        slice(ws, lit(1), nPairs), slice(ws, lit(2), nPairs),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    // the unigram table feeds THREE consumers (cur join, prev join, the
    // total) — materialize the vocabulary-sized aggregate once so the
    // corpus is not re-tokenized per consumer (same shape, same fix as
    // Dsir.logRatios). Corpus scans: one for unigram counts, one for
    // bigram counts, one for scoring — one per statistic plus the score
    // pass, the floor without fusing the two count streams. `bi` has a
    // single consumer; no checkpoint.
    val uni = graft.ops.Checkpoints.pin(
      df.select(explode(TextOps.tokens(col(textCol))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("ucnt")))
    val tot = uni.agg(sum(col("ucnt")).as("tot"))
    val bi = pairs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bcnt"))
    pairs
      .join(bi, Seq("prev", "cur"))
      .join(uni.select(col("word").as("cur"), col("ucnt").as("cur_cnt")), Seq("cur"))
      .join(uni.select(col("word").as("prev"), col("ucnt").as("prev_cnt")), Seq("prev"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log(
          lit(lambda) * (col("bcnt") / col("prev_cnt")) +
            lit(1 - lambda) * (col("cur_cnt") / col("tot")))), 6).as("avg_neglogp"))
  }

  /** Interpolated KNESER-NEY trigram surprisal — the actual CCNet/KenLM
    * filter formulation (Chen & Goodman 1999), one order up from
    * [[bigramSurprisal]] and with the published smoothing instead of
    * MLE interpolation. Self-scoring the counted corpus keeps every
    * scored trigram's count ≥ 1, so the absolute-discount numerators
    * stay positive and no unseen-mass fallback path is exercised.
    *
    * All counts are INTEGER-EXACT and derived from the one trigram
    * table (so the context identity c(uv) = Σ_w c(uvw) holds by
    * construction — a raw bigram count would disagree at document
    * tails):
    *   - c(uvw), c(uv) = Σ_w c(uvw), N1+(uv·) = |{w : c(uvw)>0}|
    *   - N1+(·vw) = |{u}|, N1+(·v·) = |{(u,w)}|, N1+(v·) = |{w}|
    *   - N1+(·w) = |{v}| over the (v,w) type table, N1+(··) = its size
    * with the standard three-level interpolation, fixed discount
    * D = 0.75 (binary-exact, the λ discipline of [[bigramSurprisal]]):
    *   p(w|uv) = (c(uvw)−D)/c(uv) + D·N1+(uv·)/c(uv) · p(w|v)
    *   p(w|v)  = (N1+(·vw)−D)/N1+(·v·) + D·N1+(v·)/N1+(·v·) · p(w)
    *   p(w)    = N1+(·w)/N1+(··)
    * Per-doc score = round(avg(−ln p), 6) — the established cross-
    * engine float contract (integer ratios, one expression-tree shape,
    * 6-dp rounding on both sides). Documents with < 3 tokens carry no
    * trigram and produce no row.
    *
    * Scale: trigram positions come straight off the token array; the
    * count tables are combiner-backed shuffles on their keys; scoring
    * joins shuffle on (u,v,w)/(u,v)/(v,w)/v/w — vocabulary-scale sides,
    * deliberately never broadcast; the trigram table is pinned once for
    * its five aggregate consumers. */
  def knTrigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val d = lit(discount)
    val ws = TextOps.tokens(col(textCol))
    val nTris = greatest(size(ws) - 2, lit(0))
    val tris = df.select(col(idCol),
      explode(zip_with(
        zip_with(slice(ws, lit(1), nTris), slice(ws, lit(2), nTris),
          (a, b) => struct(a.as("u"), b.as("v"))),
        slice(ws, lit(3), nTris),
        (p, c) => struct(p.getField("u").as("u"), p.getField("v").as("v"),
          c.as("w")))).as("tg"))
      .select(col(idCol), col("tg.u").as("u"), col("tg.v").as("v"),
        col("tg.w").as("w"))
    val tri = graft.ops.Checkpoints.pin(
      tris.groupBy(col("u"), col("v"), col("w"))
        .agg(count(lit(1)).as("c_uvw")))
    val ctx2 = tri.groupBy(col("u"), col("v"))
      .agg(sum(col("c_uvw")).as("c_uv"), count(lit(1)).as("n1p_uv_dot"))
    // (v,w) TYPES — the Kneser-Ney continuation universe
    val mid = graft.ops.Checkpoints.pin(
      tri.groupBy(col("v"), col("w")).agg(count(lit(1)).as("n1p_dot_vw")))
    val midctx = tri.groupBy(col("v"))
      .agg(count(lit(1)).as("n1p_dot_v_dot"),
        countDistinct(col("w")).as("n1p_v_dot"))
    val cont = mid.groupBy(col("w")).agg(count(lit(1)).as("n1p_dot_w"))
    val total = mid.agg(count(lit(1)).as("n1p_dot_dot"))
    val p3 = col("n1p_dot_w") / col("n1p_dot_dot")
    val p2 = greatest(col("n1p_dot_vw") - d, lit(0.0)) / col("n1p_dot_v_dot") +
      d * col("n1p_v_dot") / col("n1p_dot_v_dot") * p3
    val p1 = greatest(col("c_uvw") - d, lit(0.0)) / col("c_uv") +
      d * col("n1p_uv_dot") / col("c_uv") * p2
    tris
      .join(tri, Seq("u", "v", "w"))
      .join(ctx2, Seq("u", "v"))
      .join(mid, Seq("v", "w"))
      .join(midctx, Seq("v"))
      .join(cont, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        round(avg(-log(p1)), 6).as("avg_neglogp"))
  }

  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("word"))
    val counts = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("tot"))
    toks
      .join(counts, Seq("word"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt") / col("tot"))), 6).as("avg_neglogp"))
  }
}
