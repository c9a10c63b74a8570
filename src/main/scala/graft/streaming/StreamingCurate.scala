package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.dedup.{BandedCatalog, ExactCatalog, SubstrCatalog}

/** The COMPOSED streaming curation pipeline: every micro-batch runs the
  * dedup tiers in sequence, each against its own persistent catalog —
  *
  *   0. IMAGE ([[graft.dedup.ImageCatalog]] via [[StreamingImageDedup]])
  *      — OPTIONAL, engaged by `imageCol`: byte-exact then perceptual
  *      (pHash quarter-blocked) image dedup runs FIRST among the media
  *      tiers — a 100 TB multimodal crawl dedups images before anything
  *      else (LAION/DataComp-style), and every doc it drops never pays
  *      text shingling or a second pixel decode. Requires both image
  *      catalog dirs; checked loudly up front like the semantic tier.
  *   0b. AUDIO ([[graft.dedup.AudioDedup]]) — OPTIONAL, engaged by
  *      `audioCol`: the volume-invariant envelope-hash tier over real
  *      PCM decode, after the image tiers (it subsumes byte-exact audio
  *      dedup — a byte copy has the identical envelope hash).
  *   0c. VIDEO ([[graft.dedup.VideoCatalog]] via [[StreamingVideoDedup]])
  *      — OPTIONAL, engaged by `videoCol`: aligned frame-hash-sequence
  *      dedup over the real AVI container walk + per-frame pixel decode,
  *      after the audio tier (the most expensive media decode runs on
  *      the smallest surviving set; like audio, one perceptual tier
  *      subsumes byte-exact video dedup).
  *   0d. MP4 EXACT/RE-MUX ([[graft.dedup.Mp4Dedup]] via
  *      [[StreamingMp4Dedup]]) — OPTIONAL, engaged by `mp4Col`: the
  *      mdat-payload-signature tier for ISO-BMFF containers, LAST among
  *      the media tiers — its byte pass is the cheapest media decode,
  *      but it only catches byte-level copies, so the perceptual tiers
  *      get first claim on cluster representatives.
  *   (before everything) WORD BLOCKLIST ([[graft.text.WordBlocklist]])
  *      — OPTIONAL, engaged by `wordBlocklist`: the C4/Dolma bad-word
  *      stage over the ORIGINAL text (doc-level drop, or line-level
  *      rewrite with `wordBlocklistLineLevel`), then PII SCRUB
  *      (`scrubPii`) — both pure map-side stages ahead of every tier.
  *   (before everything) DECONTAMINATION ([[StreamingDecontam]]) —
  *      OPTIONAL, engaged by `decontamDir`: drop docs sharing
  *      ≥ `decontamMinHits` distinct normalized word n-grams with the
  *      registered benchmark/eval sets. FIRST overall, ahead even of
  *      the media tiers (r13 ADVICE): it needs only `textCol`, and a
  *      contaminated doc must neither pay the media decodes (the most
  *      expensive work in the chain) nor become a media cluster's kept
  *      representative whose fingerprints enter the persistent media
  *      catalogs — that would permanently suppress future CLEAN docs
  *      carrying the same media. A read-only registry: training batches
  *      never advance it (pure idempotent filter, no crash ordering).
  *   1. EXACT ([[ExactCatalog]]): drop literal copies of anything the
  *      corpus has seen; in-batch copies keep the lowest id. Cheapest
  *      tier first — every doc it drops never pays MinHash or window
  *      fingerprinting.
  *   2. NEAR ([[StreamingNearDedup]] / [[graft.dedup.BandedCatalog]]):
  *      drop docs whose estimated Jaccard against the corpus clears the
  *      threshold; in-batch near-dup clusters collapse to their
  *      reachability-min representative. Runs on the RAW text so its
  *      signatures stay comparable with the catalog's.
  *   3. SEMANTIC ([[graft.sim.SemDedup]] over a persistent
  *      [[graft.sim.IvfIndex]]) — OPTIONAL, engaged by `semIndexDir`.
  *      Configuring it is a caller CONTRACT, checked loudly up front:
  *      every batch must carry `embCol`, and the index must already be
  *      BUILT (an IVF index needs trained centroids, so unlike the
  *      fingerprint catalogs this tier cannot bootstrap from an empty
  *      dir — build it from the prior corpus, or from the first crawl,
  *      before streaming). Drops docs whose embedding cosine against
  *      the corpus index clears the SemDeDup threshold (Abbas 2023).
  *      The near tier projects to (id, text), so the embeddings are
  *      re-joined from the pinned batch by id — a broadcast-sized join
  *      at micro-batch scale.
  *   4. SUBSTRING ([[SubstrCatalog]]): rewrite the survivors, scrubbing
  *      every ≥w-token span whose windows the corpus already carries
  *      (the rewrite tier runs LAST — it changes the text, and the
  *      filter tiers' state is keyed on what was ingested, not on
  *      scrubbed derivatives).
  *
  * Output per batch: `(idCol, n_tokens, n_removed, clean_text)` for the
  * docs that survived both filter tiers.
  *
  * An OPTIONAL statistics surface (`statsDir`) folds the curated
  * output's word n-grams into the persistent CMS + HLL accumulators and
  * its doc lengths into the deterministic log-binned histogram
  * ([[StreamingHistogram]] — the quantile leg) after everything else —
  * see the note at the fold site for the at-most-once stats contract.
  *
  * Crash contract — the reason this is one operator and not three
  * chained `foreachBatch` writers: each tier appends AFTER its deliver
  * callback returns, so nesting the tiers inside each other's callbacks
  * makes EVERY catalog append land after the FINAL delivery
  * (deliver → substr append → sem index append → near append → exact
  * append → video appends → audio append → image appends). Chaining
  * three independent writers instead would let tier N's append land
  * before tier N+1 ever ran — a crash between them silently suppresses
  * the in-flight docs on replay without them ever reaching downstream
  * (at-most-once loss). Nested, a crash anywhere replays the batch into
  * at-least-once delivery; a replay whose appends partially landed is
  * suppressive (exact/near re-drop, substr re-scrubs — downstream keeps
  * the FIRST delivery per doc id, as everywhere in this family).
  */
object StreamingCurate {

  /** Every tier's configuration in ONE object (r13 verdict: the
    * applyBatch/writer pair used to thread ~24 parameters TWICE, and the
    * duplicated default lists were one added tier away from diverging
    * silently). Layout parameters are CREATE-TIME defaults only — each
    * catalog's meta is authoritative once it exists. Per-BATCH values
    * (`added`, `deliver`) stay call arguments: they change every
    * trigger, the config never does. */
  final case class CurateConfig(
      exactDir: String, nearDir: String, substrDir: String,
      idCol: String, textCol: String, w: Int,
      shingleSize: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.7,
      numBuckets: Int = ExactCatalog.DefaultBuckets,
      nearNumBuckets: Int = BandedCatalog.DefaultBuckets,
      compactAboveFiles: Int = 16,
      retainAddedBehind: Option[Long] = None,
      retentionSweepEvery: Long = 256L,
      semIndexDir: Option[String] = None,
      embCol: String = "embedding",
      semThreshold: Double = 0.95,
      imageCol: Option[String] = None,
      imageExactDir: Option[String] = None,
      imagePhashDir: Option[String] = None,
      imageMaxHamming: Int = graft.dedup.ImageDedup.MaxBlockedHamming,
      audioCol: Option[String] = None,
      audioEnvDir: Option[String] = None,
      audioMaxHamming: Int = graft.dedup.ImageDedup.MaxBlockedHamming,
      videoCol: Option[String] = None,
      videoDir: Option[String] = None,
      videoMaxHamming: Int = graft.dedup.ImageDedup.MaxBlockedHamming,
      mp4Col: Option[String] = None,
      mp4Dir: Option[String] = None,
      mp3Col: Option[String] = None,
      mp3Dir: Option[String] = None,
      flacCol: Option[String] = None,
      flacDir: Option[String] = None,
      oggCol: Option[String] = None,
      oggDir: Option[String] = None,
      statsDir: Option[String] = None,
      statsNgram: Int = 3,
      decontamDir: Option[String] = None,
      decontamDirs: Seq[String] = Nil,
      decontamMinHits: Long = 1L,
      scrubPii: Boolean = false,
      wordBlocklist: Seq[String] = Nil,
      wordBlocklistLineLevel: Boolean = false) {
    /** All configured decontam registries (single + multi forms). */
    def allDecontamDirs: Seq[String] = decontamDir.toSeq ++ decontamDirs
  }

  /** One micro-batch through all tiers (pure enough to unit-test
    * without the engine). */
  def applyBatch(
      batch0: DataFrame, cfg: CurateConfig, added: Long = 0L,
      deliver: DataFrame => Unit = _ => ()): DataFrame = {
    import cfg._
    // WORD BLOCKLIST runs before everything (the published C4/Dolma
    // stage evaluates the ORIGINAL page text, so it precedes even the
    // PII scrub — a masked token must not hide a listed word, and a
    // blocked doc never pays the scrub): doc-level drops the document,
    // line-level rewrites it with offending lines removed. Both are
    // pure map-side column work — zero shuffles, no catalog, no crash
    // ordering (a replay re-drops/re-scrubs identically).
    val batchW =
      if (wordBlocklist.isEmpty) batch0
      else if (wordBlocklistLineLevel)
        batch0.withColumn(textCol, graft.text.WordBlocklist.scrubLines(
          org.apache.spark.sql.functions.col(textCol), wordBlocklist))
      else graft.text.WordBlocklist.filterDocs(batch0, textCol, wordBlocklist)
    // PII scrub runs next — before any tier fingerprints or catalogs
    // the text, so an email/phone/IP can never persist in a catalog
    // entry, a delivered rewrite, or a stats accumulator. A pure scalar
    // map: plan cost is absorbed into the batch's first projection.
    val batch =
      if (scrubPii)
        batchW.withColumn(textCol,
          graft.text.Pii.scrub(org.apache.spark.sql.functions.col(textCol)))
      else batchW
    var out: DataFrame = batch.sparkSession.emptyDataFrame
    // the semantic tier's caller contract, checked BEFORE any tier
    // probes or appends: a missing embedding column (or an unbuilt
    // index) must fail the batch up front, not mid-chain after the
    // exact/near catalogs already did work
    semIndexDir.foreach { idx =>
      require(batch.columns.contains(embCol),
        s"semIndexDir is configured but the batch has no '$embCol' " +
          s"column (batch columns: ${batch.columns.mkString(", ")})")
      val _ = graft.sim.IvfIndex.readCentroids(batch.sparkSession, idx)
    }
    // the media tiers' caller contracts, same up-front discipline — one
    // data-driven pass (a new tier adds a ROW here, not a stanza):
    // (tier name, configured column, required catalog dirs with their
    // config-field names)
    val mediaContracts: Seq[(String, Option[String], Seq[(String, Option[String])])] = Seq(
      ("image", imageCol, Seq(
        "imageExactDir" -> imageExactDir, "imagePhashDir" -> imagePhashDir)),
      ("audio", audioCol, Seq("audioEnvDir" -> audioEnvDir)),
      ("video", videoCol, Seq("videoDir" -> videoDir)),
      ("mp4", mp4Col, Seq("mp4Dir" -> mp4Dir)),
      ("mp3", mp3Col, Seq("mp3Dir" -> mp3Dir)),
      ("flac", flacCol, Seq("flacDir" -> flacDir)),
      ("ogg", oggCol, Seq("oggDir" -> oggDir)))
    mediaContracts.foreach { case (tier, colOpt, dirs) =>
      colOpt.foreach { c =>
        require(batch.columns.contains(c),
          s"${tier}Col is configured but the batch has no '$c' column " +
            s"(batch columns: ${batch.columns.mkString(", ")})")
        val missing = dirs.collect { case (n, None) => n }
        require(missing.isEmpty,
          s"${tier}Col is configured but ${missing.mkString("/")} " +
            s"${if (missing.size > 1) "are" else "is"} not — the $tier " +
            "tier needs its persistent catalog(s)")
      }
    }
    // multi-consumer chains read the batch more than once (the media
    // tiers, tier 1, the embedding re-join, and the decontam probe's
    // gram pass + anti-join) — pin once so later consumers replay a
    // checkpoint, not the upstream
    val src =
      if (semIndexDir.isDefined || imageCol.isDefined || audioCol.isDefined ||
          videoCol.isDefined || mp4Col.isDefined || mp3Col.isDefined ||
          flacCol.isDefined || oggCol.isDefined || allDecontamDirs.nonEmpty)
        graft.ops.Checkpoints.pin(batch)
      else batch
    // the substring rewrite, shared by every chain length
    def substrTier(survivors: DataFrame): Unit =
      out = StreamingSubstrDedup.applyBatch(
        survivors.select(org.apache.spark.sql.functions.col(idCol),
          org.apache.spark.sql.functions.col(textCol)),
        substrDir, idCol, textCol, w, numBuckets,
        compactAboveFiles = compactAboveFiles, added = added,
        retainAddedBehind = retainAddedBehind,
        retentionSweepEvery = retentionSweepEvery,
        deliver = deliver)
    // text tiers (exact → near → [sem] → substr) over the media
    // survivors (or the whole decontaminated batch when the media tiers
    // are off)
    def textTiers(upstream: DataFrame): Unit = {
      val _ = StreamingExactDedup.applyBatch(
        upstream, exactDir, idCol, textCol, numBuckets,
        compactAboveFiles = compactAboveFiles, added = added,
        retainAddedBehind = retainAddedBehind,
        retentionSweepEvery = retentionSweepEvery,
        deliver = exactSurvivors => {
          val _ = StreamingNearDedup.applyBatch(
            exactSurvivors, nearDir, idCol, textCol,
            shingleSize, bands, rowsPerBand, jaccardThreshold,
            nearNumBuckets, compactAboveFiles = compactAboveFiles,
            added = added, retainAddedBehind = retainAddedBehind,
            retentionSweepEvery = retentionSweepEvery,
            deliver = nearSurvivors => semIndexDir match {
              case None => substrTier(nearSurvivors)
              case Some(idx) =>
                import org.apache.spark.sql.functions.col
                val withEmb = nearSurvivors.join(
                  src.select(col(idCol), col(embCol)), Seq(idCol))
                val _ = graft.sim.SemDedup.applyBatchIndexed(
                  withEmb, idx, idCol, embCol, semThreshold,
                  deliver = semSurvivors => substrTier(semSurvivors))
            })
        })
    }
    // the ogg exact/re-tag tier (when engaged) is the last media tier
    // before the text chain
    def oggThenText(upstream: DataFrame): Unit = oggCol match {
      case None => textTiers(upstream)
      case Some(oc) =>
        val _ = StreamingOggDedup.applyBatch(
          upstream, oggDir.get, idCol, oc, numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = oggSurvivors => textTiers(oggSurvivors))
    }
    // the flac exact/re-tag tier (when engaged)
    def flacThenText(upstream: DataFrame): Unit = flacCol match {
      case None => oggThenText(upstream)
      case Some(fc) =>
        val _ = StreamingFlacDedup.applyBatch(
          upstream, flacDir.get, idCol, fc, numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = flacSurvivors => oggThenText(flacSurvivors))
    }
    // the mp3 exact/re-tag tier (when engaged) — byte-level like the
    // mp4 tier, so the perceptual tiers keep first claim on cluster
    // representatives
    def mp3ThenText(upstream: DataFrame): Unit = mp3Col match {
      case None => flacThenText(upstream)
      case Some(mc) =>
        val _ = StreamingMp3Dedup.applyBatch(
          upstream, mp3Dir.get, idCol, mc, numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = mp3Survivors => flacThenText(mp3Survivors))
    }
    // the mp4 exact/re-mux tier (when engaged) runs LAST among the
    // perceptual media tiers — its mdat byte pass is the cheapest media
    // decode, but it only catches byte-level copies, so the perceptual
    // tiers get first claim on cluster representatives; nested in the
    // same deliver chain so its append also lands after the final
    // delivery
    def mp4ThenText(upstream: DataFrame): Unit = mp4Col match {
      case None => mp3ThenText(upstream)
      case Some(mc) =>
        val _ = StreamingMp4Dedup.applyBatch(
          upstream, mp4Dir.get, idCol, mc, numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = mp4Survivors => mp3ThenText(mp4Survivors))
    }
    // the video tier (when engaged) sits between the audio tier and the
    // mp4/text tiers, nested in the same deliver chain so its appends
    // also land after the final delivery
    def videoThenText(upstream: DataFrame): Unit = videoCol match {
      case None => mp4ThenText(upstream)
      case Some(vc) =>
        val _ = StreamingVideoDedup.applyBatch(
          upstream, videoDir.get, idCol, vc,
          maxHamming = videoMaxHamming, numBuckets = numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = videoSurvivors => mp4ThenText(videoSurvivors))
    }
    // the audio tier (when engaged) sits between the image tiers and
    // the video/text tiers, nested in the same deliver chain so its
    // append also lands after the final delivery
    def audioThenText(upstream: DataFrame): Unit = audioCol match {
      case None => videoThenText(upstream)
      case Some(ac) =>
        val _ = StreamingAudioDedup.applyBatch(
          upstream, audioEnvDir.get, idCol, ac, audioMaxHamming,
          numBuckets, compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = audioSurvivors => videoThenText(audioSurvivors))
    }
    // decontamination runs FIRST overall (class doc): a contaminated doc
    // never pays a media decode and its media fingerprints never enter
    // the persistent media catalogs. A pure lazy filter over the pinned
    // src — single downstream consumer, so no extra pin.
    val cleanSrc =
      if (allDecontamDirs.isEmpty) src
      else StreamingDecontam.applyBatchMulti(
        src, allDecontamDirs, idCol, textCol, minHits = decontamMinHits)
    imageCol match {
      case None => audioThenText(cleanSrc)
      case Some(ic) =>
        val _ = StreamingImageDedup.applyBatch(
          cleanSrc, imageExactDir.get, imagePhashDir.get, idCol, ic,
          imageMaxHamming, numBuckets,
          compactAboveFiles = compactAboveFiles, added = added,
          retainAddedBehind = retainAddedBehind,
          retentionSweepEvery = retentionSweepEvery,
          deliver = imageSurvivors => audioThenText(imageSurvivors))
    }
    // OPTIONAL statistics surface, LAST (after the delivery and every
    // catalog append): fold the curated output's word n-grams into the
    // persistent heavy-hitter CMS ([[StreamingSketch]]) and distinct-
    // count HLL ([[StreamingDistinct]]) under `statsDir` — the corpus
    // statistics a year-long curation stream reports from, accumulated
    // as it filters. Never a delivery gate: both stores tag `added` and
    // merge at most once, so an at-least-once replay cannot double-
    // count; the price of running last is the converse window — a crash
    // AFTER the catalog appends but BEFORE this merge loses the batch's
    // stats contribution (the replay's suppressed output folds instead).
    // At-most-once stats over at-least-once delivery is the right trade
    // for a reporting surface; moving the fold before the appends would
    // just flip it to double-counting.
    statsDir.foreach { sd =>
      import org.apache.spark.sql.functions.{col, length}
      val grams = StreamingSketch.wordNgramItems(
        out.select(col("clean_text")), "clean_text", statsNgram)
      val _ = StreamingSketch.applyBatch(grams, s"$sd/cms", added)
      val _2 = StreamingDistinct.applyBatch(grams, s"$sd/hll", added)
      // the quantile leg (r13 verdict item 3): curated doc LENGTHS fold
      // into the deterministic log-binned histogram — length drift is
      // the classic corpus-quality regression signal a year-long stream
      // reports from. Same added-tag at-most-once contract as the other
      // two accumulators.
      val _3 = StreamingHistogram.applyBatch(
        out.select(length(col("clean_text")).cast("long").as("len")),
        s"$sd/hist", added)
    }
    out
  }

  /** foreachBatch writer: `deliver` receives each micro-batch's curated
    * rewrites (write them to the downstream sink there). Catalog rows
    * are tagged with the engine's batch id — the same [[CurateConfig]]
    * drives every trigger, so the config cannot drift from the batch
    * path by construction. */
  def writer(
      docs: DataFrame, cfg: CurateConfig, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())(
      deliver: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val _ = applyBatch(batch, cfg, added = batchId, deliver = deliver)
        }
      }
}
