package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Cross-document repeated-SUBSTRING removal — the span-level dedup family
  * of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499): boilerplate, licenses, and templated
  * passages repeat across otherwise-distinct documents, so document-level
  * dedup (exact / MinHash / SimHash — [[Dedup]]) never fires while the
  * corpus still carries massive verbatim repetition. The paper removes
  * duplicated substrings with a corpus-wide suffix array; the
  * distributed restatement here is the window-fingerprint form production
  * pipelines use at scale: a span is duplicated iff every length-`w`
  * token window inside it is duplicated, so finding duplicated
  * fixed-width windows and merging overlapping hits recovers maximal
  * duplicated spans ≥ `w` tokens without any global ordering structure.
  *
  * Semantics (keep-first-owner, deterministic and order-free):
  *  - every document's every `w`-token window is fingerprinted (60-bit
  *    paired-polynomial [[graft.functions.GraftHash.tokenWindowFps]]);
  *  - a window VALUE is duplicated iff it occurs in ≥ 2 distinct
  *    documents; its owner is the minimum document id containing it;
  *  - an occurrence is REMOVED iff its document is not the owner — the
  *    corpus keeps exactly the owner's copy (including any repeats
  *    inside the owner document; doc-internal repetition is a different
  *    operator: `rep_ratios` / [[Dedup.dedupLinesWithin]]);
  *  - removed token indices are the union of removed windows' [s, s+w-1]
  *    ranges; the rewrite drops those tokens and joins survivors with
  *    single spaces (token-level rewrite, whitespace-normalizing — the
  *    paper's semantics, which operate on the token stream).
  *
  * Scale shape (the 100 TB question): one scan computes all window
  * fingerprints (prefix-hash kernel, O(bytes)); the only wide exchange
  * is the hash-shuffle of (fp, doc, pos) rows — 8-byte keys, ~one row
  * per corpus token, the same order of shuffle mass as the MinHash
  * banding path. Ownership is a map-side-combinable min/max aggregate;
  * the duplicated-fp set is a tiny fraction of windows, so the
  * occurrence←owner join broadcasts under AQE at any real corpus size.
  * Span merge and rewrite are per-document array operations — no
  * quadratic stage, no driver collect anywhere.
  */
object SubstrDedup {

  /** One row per `w`-token window occurrence: (id, pos, fp), `pos` the
    * 1-based token index of the window start. ~one row per corpus token;
    * documents shorter than `w` tokens contribute nothing. */
  def windowOccurrences(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(GraftFunctions.tokenWindowFps(col(textCol), w)))
      .select(col(idCol), (col("pos") + 1).cast("int").as("pos"),
        col("col").as("fp"))

  /** Removal starts: every (id, pos) whose window fingerprint also occurs
    * in a lower-id document. The ownership aggregate shuffles 8-byte
    * fingerprints (map-side combined); `min != max` of the id is the
    * ≥-2-distinct-docs test without a countDistinct. */
  def removalStarts(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val occ = windowOccurrences(docs, idCol, textCol, w)
    val owners = occ.groupBy(col("fp"))
      .agg(min(col(idCol)).as("__owner"), max(col(idCol)).as("__maxid"))
      .filter(col("__owner") =!= col("__maxid"))
      .select(col("fp"), col("__owner"))
    occ.join(owners, "fp")
      .filter(col(idCol) > col("__owner"))
      .select(col(idCol), col("pos"))
  }

  /** The distinct window-fingerprint SET of a corpus — the membership
    * state an INCREMENTAL pipeline carries between crawls (one 8-byte
    * value per distinct window; ownership needs no doc id because the
    * catalog corpus always owns — see [[removalStartsIncremental]]).
    * Column: `fp`. */
  def windowFpSet(docs: DataFrame, textCol: String, w: Int): DataFrame =
    docs.select(explode(GraftFunctions.tokenWindowFps(col(textCol), w))
        .as("fp"))
      .distinct()

  /** Incremental removal starts for a NEW batch against the window set of
    * all previously-processed crawls: a batch occurrence is removed iff
    * its window value already EXISTS in the catalog (the prior corpus
    * owns every window it contains — one prior occurrence plus this one
    * is cross-document duplication, and crawl order makes the prior copy
    * first), or it duplicates within the batch and a lower-id batch doc
    * owns it. When every catalog id precedes every batch id this equals
    * the one-shot [[removalStarts]] of the union restricted to batch
    * docs (parity spec-pinned); processing order decides ownership
    * otherwise, as in every incremental operator here.
    *
    * Scale: the occurrence←catalog join is an 8-byte-key hash join
    * (bucket co-location for a persistent catalog); the in-batch owner
    * side is small and broadcasts. */
  def removalStartsIncremental(
      batch: DataFrame, catalogFps: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame =
    removalStartsIncrementalFromOcc(
      windowOccurrences(batch, idCol, textCol, w), catalogFps, idCol)

  /** [[removalStartsIncremental]] from pre-computed occurrences — the
    * seam [[SubstrCatalog.applyBatch]] uses so one pinned occurrence
    * frame feeds the pruned catalog probe, this join AND the catalog
    * advance without re-running the window-fingerprint scan. `occ`
    * needs columns (`idCol`, `pos`, `fp`). */
  def removalStartsIncrementalFromOcc(
      occ: DataFrame, catalogFps: DataFrame, idCol: String): DataFrame = {
    val owners = occ.groupBy(col("fp"))
      .agg(min(col(idCol)).as("__owner"), max(col(idCol)).as("__maxid"))
      .filter(col("__owner") =!= col("__maxid"))
      .select(col("fp"), col("__owner"))
    occ
      .join(catalogFps.select(col("fp"), lit(1).as("__incat")), Seq("fp"), "left")
      .join(owners, Seq("fp"), "left")
      .filter(col("__incat").isNotNull || col(idCol) > col("__owner"))
      .select(col(idCol), col("pos"))
  }

  /** Maximal removed-token runs per document: (id, span_lo, span_hi),
    * 1-based inclusive token indices — overlapping and adjacent removed
    * windows merged (starts sorted per doc, fold with the `s ≤ hi+1`
    * merge rule; `hi` is monotone because starts are sorted). */
  def removedSpans(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    spansFromStarts(removalStarts(docs, idCol, textCol, w), idCol, w)

  /** [[removedSpans]] from an explicit removal-start set (the batch and
    * incremental paths share this merge stage). */
  def spansFromStarts(starts: DataFrame, idCol: String, w: Int): DataFrame = {
    val perDoc = starts
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    val spans = aggregate(
      col("__starts"),
      array().cast("array<struct<lo:int,hi:int>>"),
      (acc, s) => when(
          size(acc) === 0 || s > element_at(acc, -1).getField("hi") + 1,
          concat(acc, array(struct(s.cast("int").as("lo"),
            (s + lit(w) - 1).cast("int").as("hi")))))
        .otherwise(concat(
          slice(acc, lit(1), size(acc) - 1),
          array(struct(element_at(acc, -1).getField("lo").as("lo"),
            (s + lit(w) - 1).cast("int").as("hi"))))))
    perDoc.select(col(idCol), explode(spans).as("__span"))
      .select(col(idCol),
        col("__span.lo").as("span_lo"), col("__span.hi").as("span_hi"))
  }

  /** The rewrite over the FULL corpus: (id, n_tokens, n_removed,
    * clean_text) — `clean_text` is the surviving tokens joined by single
    * spaces (unaffected docs round-trip to their whitespace-normalized
    * text, `n_removed` 0). The spans side is only the affected minority,
    * so the join broadcasts under AQE; the kept-token filter tests each
    * token index against the doc's merged spans (spans ≪ tokens). */
  def dedupSubstrings(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    rewriteWithSpans(docs, removedSpans(docs, idCol, textCol, w), idCol, textCol)

  /** Incremental rewrite of a new batch against the catalog window set —
    * [[removalStartsIncremental]] semantics, [[dedupSubstrings]] output
    * shape. The caller advances the catalog afterwards with
    * `catalogFps union windowFpSet(batch)` distinct (or an append to the
    * persistent store). */
  def dedupSubstringsIncremental(
      batch: DataFrame, catalogFps: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame =
    rewriteWithSpans(batch,
      spansFromStarts(
        removalStartsIncremental(batch, catalogFps, idCol, textCol, w),
        idCol, w),
      idCol, textCol)

  /** Output-shaped rewrite from an explicit removal-start set — the
    * stage [[SubstrCatalog.applyBatch]] shares with the in-memory
    * incremental path (both end `starts → merged spans → rewrite`). */
  def dedupSubstringsFromStarts(
      docs: DataFrame, starts: DataFrame,
      idCol: String, textCol: String, w: Int): DataFrame =
    rewriteWithSpans(docs, spansFromStarts(starts, idCol, w), idCol, textCol)

  /** The rewrite stage shared by the batch and incremental paths. */
  private def rewriteWithSpans(
      docs: DataFrame, spanRows: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val spans = spanRows
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_lo"), col("span_hi"))).as("__spans"))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("__spans"),
          array().cast("array<struct<span_lo:int,span_hi:int>>"))
          .as("__spans"))
      .select(col(idCol),
        GraftFunctions.tokenizeWs(col(textCol)).as("__toks"), col("__spans"))
      .select(col(idCol), col("__toks"), col("__spans"),
        // keep token iff its 1-based index is covered by no removed span
        filter(col("__toks"), (_, i) =>
          !exists(col("__spans"), sp =>
            sp.getField("span_lo") <= i + 1 &&
              i + 1 <= sp.getField("span_hi"))).as("__kept"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }
}
