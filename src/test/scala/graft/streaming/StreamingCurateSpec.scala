package graft.streaming

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.dedup.{BandedCatalog, ExactCatalog}

/** The composed streaming curation pipeline ([[StreamingCurate]]):
  * every tier fires against its own catalog within one micro-batch,
  * streaming equals sequential batch composition, and the strict crash
  * contract — NO catalog advances when the final delivery fails (the
  * all-appends-after-final-delivery ordering that makes the composition
  * one operator rather than three chained writers). The composed
  * Spark-vs-DuckDB semantics are oracled end to end by the
  * `curate_stream_batch` CORRECTNESS row. */
class StreamingCurateSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val W = 4

  private val b1 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "pack my box with five dozen liquor jugs while the band plays on")

  private val b2 = Seq(
    10L -> b1.head._2, // exact copy of doc 1 → exact tier drops
    11L -> (b1(1)._2 + " xx"), // near-dup of doc 2 → near tier drops
    // carries doc 2's "my box with five dozen" span in fresh text →
    // substr tier scrubs, filter tiers keep
    12L -> "completely different content here about weather my box with five dozen reports daily",
    13L -> "unrelated streaming data flows through the night pipeline quietly",
    14L -> "duplicate pair text appears twice in this batch exactly",
    15L -> "duplicate pair text appears twice in this batch exactly") // in-batch copy → dropped

  private def dirs(tag: String): (String, String, String) = {
    val tmp = Files.createTempDirectory(s"graft-curate-$tag").toString
    (s"$tmp/exact", s"$tmp/near", s"$tmp/substr")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  private def catCounts(e: String, n: String, s: String): (Long, Long, Long) =
    (ExactCatalog.read(spark, e).count(),
      BandedCatalog.read(spark, n).count(),
      ExactCatalog.read(spark, s, graft.dedup.SubstrCatalog.kindFor(W)).count())

  test("pii scrub stage: raw PII never reaches delivered text; catalogs key on the MASKED form") {
    val (e, n, s) = dirs("pii")
    val cfg = StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
      scrubPii = true)
    val base = "please reach our support team at the main office today"
    val out1 = StreamingCurate.applyBatch(
      Seq(1L -> (base + " mail a.b@example.com or +1 555 0100 now"))
        .toDF("doc_id", "text"), cfg, added = 0L)
      .select("clean_text").as[String].collect()
    assert(out1.length == 1)
    assert(!out1(0).contains("@") && !out1(0).contains("555"),
      s"raw PII leaked into delivered text: ${out1(0)}")
    assert(out1(0).contains("<EMAIL>") && out1(0).contains("<PHONE>"))
    // a SECOND batch with a DIFFERENT raw email/phone on the same base
    // text scrubs to the SAME masked form → the exact catalog (which
    // fingerprinted the masked text) must drop it across batches
    val out2 = StreamingCurate.applyBatch(
      Seq(2L -> (base + " mail z.q@other.org or +44 20 7946 0958 now"))
        .toDF("doc_id", "text"), cfg, added = 1L)
    assert(out2.count() == 0,
      "differently-PII'd copies of one doc must collapse on the masked form")
  }

  test("all three tiers fire; streaming equals sequential batch composition") {
    implicit val sqlCtx = spark.sqlContext
    // reference: sequential applyBatch into its own catalog set
    val (re, rn, rs) = dirs("ref")
    val r1 = StreamingCurate.applyBatch(b1.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(re, rn, rs, "doc_id", "text", W),
      added = 0L)
    val r2 = StreamingCurate.applyBatch(b2.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(re, rn, rs, "doc_id", "text", W),
      added = 1L)
    val want = (rows(r1) ++ rows(r2)).toSet

    val (se, sn, ss) = dirs("stream")
    val delivered = ArrayBuffer.empty[(Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = StreamingCurate.writer(input.toDS().toDF("doc_id", "text"),
        StreamingCurate.CurateConfig(se, sn, ss, "doc_id", "text", W),
        s"${Files.createTempDirectory("graft-curate-ck")}", trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))(
        df => delivered ++= rows(df)).start()
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    assert(delivered.toSet == want)

    // the per-tier evidence the composition is FOR:
    val byId = delivered.map(r => r._1 -> r).toMap
    assert(!byId.contains(10L), "exact tier must drop the literal copy")
    assert(!byId.contains(11L), "near tier must drop the near-dup")
    assert(!byId.contains(15L), "in-batch exact copy keeps the lower id")
    assert(byId.contains(14L) && byId(14L)._3 == 0L)
    assert(byId(12L)._3 > 0 && !byId(12L)._4.contains("box"),
      "substr tier must scrub the catalog span")
    assert(byId(12L)._4.startsWith("completely different content"))
    assert(byId(13L)._3 == 0L)
    assert(b1.forall { case (id, _) => byId(id)._3 == 0L })
  }

  test("optional semantic tier: an embedding near-copy drops, the index advances last") {
    val (e, n, s) = dirs("sem")
    val semIdx = s"${Files.createTempDirectory("graft-curate-ivf")}/idx"
    // corpus index: 8 axis-ish vectors in 2 lists
    val corpusVecs = (0 until 8).map(i => (100L + i,
      Seq(math.cos(i * 0.1), math.sin(i * 0.1), if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("vec_id", "embedding")
    graft.sim.IvfIndex.build(corpusVecs, "vec_id", "embedding", semIdx, nLists = 2)

    // doc 20: fresh TEXT but embedding ~= corpus vector 100 → only the
    // semantic tier can drop it; doc 21: orthogonal-ish embedding, kept
    val batch = Seq(
      (20L, "fresh text semantically equal to an indexed document",
        Seq(math.cos(0.0) + 1e-9, math.sin(0.0), 1.0)),
      (21L, "fresh text with a genuinely new embedding direction",
        Seq(-0.9, 0.1, -0.4)))
      .toDF("doc_id", "text", "embedding")
    val out = rows(StreamingCurate.applyBatch(batch,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, semIndexDir = Some(semIdx), semThreshold = 0.95),
      added = 0L))
    assert(out.map(_._1).toSet == Set(21L),
      s"semantic tier must drop doc 20, got ${out.map(_._1)}")
    // the survivor's embedding entered the index (appends after delivery)
    assert(graft.sim.IvfIndex.vectors(spark, semIdx)
      .filter($"id" === 21L).count() == 1)
    // and a failed final delivery leaves the INDEX unadvanced too
    val nVecs = graft.sim.IvfIndex.vectors(spark, semIdx).count()
    val _ = intercept[RuntimeException] {
      StreamingCurate.applyBatch(Seq((30L, "another new doc", Seq(0.1, -0.8, 0.5)))
          .toDF("doc_id", "text", "embedding"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, semIndexDir = Some(semIdx)),
      added = 1L, deliver = _ => throw new RuntimeException("down"))
    }
    assert(graft.sim.IvfIndex.vectors(spark, semIdx).count() == nVecs)
  }

  test("optional image tier runs FIRST: image dups drop before any text tier, appends still last") {
    import graft.functions.ImageFixtures
    val (e, n, s) = dirs("img")
    val tmp = Files.createTempDirectory("graft-curate-imgcat").toString
    val (ie, ip) = (s"$tmp/ie", s"$tmp/ip")
    def img(seed: Long, variant: Int = 0) = ImageFixtures.syntheticPng(seed, variant)
    // batch 1 seeds the catalogs
    val d1 = Seq((1L, b1.head._2, img(1)), (2L, b1(1)._2, img(2)))
      .toDF("doc_id", "text", "img")
    val _ = StreamingCurate.applyBatch(d1,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(ie), imagePhashDir = Some(ip)),
      added = 0L)
    // batch 2: 30 = FRESH text but byte-copy image of doc 1 (only the
    // image exact tier can drop it); 31 = fresh text, perceptual
    // near-dup image of doc 2; 32 = fresh on every axis
    val d2 = Seq(
      (30L, "totally new text that only the image tier could reject", img(1)),
      (31L, "other new text that only perceptual hashing could reject", img(2, 1)),
      (32L, "a genuinely novel document with a genuinely novel image", img(32)))
      .toDF("doc_id", "text", "img")
    val out = rows(StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(ie), imagePhashDir = Some(ip)),
      added = 1L))
    assert(out.map(_._1).toSet == Set(32L),
      s"image tiers must drop 30 (exact) and 31 (phash), got ${out.map(_._1)}")
    // crash contract extends to the image catalogs: failed final
    // delivery leaves them unadvanced
    val before = (ExactCatalog.read(spark, ie,
      graft.dedup.ImageCatalog.KindExact).count(),
      ExactCatalog.read(spark, ip, graft.dedup.ImageCatalog.KindPhash).count())
    val _2 = intercept[RuntimeException] {
      StreamingCurate.applyBatch(Seq((40L, "yet another novel doc body", img(40)))
          .toDF("doc_id", "text", "img"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(ie), imagePhashDir = Some(ip)),
      added = 2L, deliver = _ => throw new RuntimeException("down"))
    }
    assert((ExactCatalog.read(spark, ie,
      graft.dedup.ImageCatalog.KindExact).count(),
      ExactCatalog.read(spark, ip,
        graft.dedup.ImageCatalog.KindPhash).count()) == before)
    // misconfiguration fails loudly BEFORE any tier does work
    val boom = intercept[IllegalArgumentException] {
      StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img")))
    }
    assert(boom.getMessage.contains("imageExactDir"))
  }

  test("optional audio tier: a half-volume re-encode drops between image and text tiers") {
    import graft.functions.{AudioFixtures, ImageFixtures}
    val (e, n, s) = dirs("av")
    val tmp = Files.createTempDirectory("graft-curate-avcat").toString
    def img(seed: Long) = ImageFixtures.syntheticPng(seed, 0)
    def wav(seed: Long, v: Int = 0) = AudioFixtures.syntheticWav(seed, v)
    val d1 = Seq((1L, b1.head._2, img(1), wav(1)), (2L, b1(1)._2, img(2), wav(2)))
      .toDF("doc_id", "text", "img", "wav")
    val _ = StreamingCurate.applyBatch(d1,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae")),
      added = 0L)
    // batch 2: 50 = fresh text+image but HALF-VOLUME audio of doc 1
    // (only the audio tier can drop it); 51 = fresh on every axis
    val d2 = Seq(
      (50L, "new words that only the audio envelope could reject", img(50), wav(1, 1)),
      (51L, "a wholly novel multimodal document in this batch", img(51), wav(51)))
      .toDF("doc_id", "text", "img", "wav")
    val out = rows(StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae")),
      added = 1L))
    assert(out.map(_._1).toSet == Set(51L),
      s"audio tier must drop 50, got ${out.map(_._1)}")
    // crash contract covers the audio catalog too
    val before = ExactCatalog.read(spark, s"$tmp/ae",
      graft.dedup.AudioDedup.KindEnvelope).count()
    val _2 = intercept[RuntimeException] {
      StreamingCurate.applyBatch(Seq((60L, "another fresh doc", img(60), wav(60)))
          .toDF("doc_id", "text", "img", "wav"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae")),
      added = 2L, deliver = _ => throw new RuntimeException("down"))
    }
    assert(ExactCatalog.read(spark, s"$tmp/ae",
      graft.dedup.AudioDedup.KindEnvelope).count() == before)
    // misconfiguration fails loudly
    val boom = intercept[IllegalArgumentException] {
      StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, audioCol = Some("wav")))
    }
    assert(boom.getMessage.contains("audioEnvDir"))
  }

  test("optional video tier: a whole-video re-encode drops between audio and text tiers") {
    import graft.functions.{AudioFixtures, ImageFixtures, VideoFixtures}
    val (e, n, s) = dirs("avv")
    val tmp = Files.createTempDirectory("graft-curate-avvcat").toString
    def img(seed: Long) = ImageFixtures.syntheticPng(seed, 0)
    def wav(seed: Long) = AudioFixtures.syntheticWav(seed, 0)
    def avi(seed: Long, v: Int = 0) = VideoFixtures.syntheticAvi(seed, v)
    val d1 = Seq(
      (1L, b1.head._2, img(1), wav(1), avi(1)),
      (2L, b1(1)._2, img(2), wav(2), avi(2)))
      .toDF("doc_id", "text", "img", "wav", "avi")
    val _ = StreamingCurate.applyBatch(d1,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae"), videoCol = Some("avi"), videoDir = Some(s"$tmp/vc")),
      added = 0L)
    // batch 2: 70 = fresh text+image+audio but a WHOLE-VIDEO re-encode
    // of doc 1's video (only the video tier can drop it); 71 = fresh on
    // every axis
    val d2 = Seq(
      (70L, "new words that only frame-sequence hashing could reject",
        img(70), wav(70), avi(1, 1)),
      (71L, "a wholly novel four-modality document in this batch",
        img(71), wav(71), avi(71)))
      .toDF("doc_id", "text", "img", "wav", "avi")
    val out = rows(StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae"), videoCol = Some("avi"), videoDir = Some(s"$tmp/vc")),
      added = 1L))
    assert(out.map(_._1).toSet == Set(71L),
      s"video tier must drop 70, got ${out.map(_._1)}")
    // crash contract covers both video tiers too
    val before = (ExactCatalog.read(spark, s"$tmp/vc/block",
      graft.dedup.VideoCatalog.blockKind(4)).count(),
      ExactCatalog.read(spark, s"$tmp/vc/sig",
        graft.dedup.VideoCatalog.sigKind(4)).count())
    val _2 = intercept[RuntimeException] {
      StreamingCurate.applyBatch(Seq((80L, "another fresh doc", img(80), wav(80), avi(80)))
          .toDF("doc_id", "text", "img", "wav", "avi"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, imageCol = Some("img"), imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip"), audioCol = Some("wav"), audioEnvDir = Some(s"$tmp/ae"), videoCol = Some("avi"), videoDir = Some(s"$tmp/vc")),
      added = 2L, deliver = _ => throw new RuntimeException("down"))
    }
    assert((ExactCatalog.read(spark, s"$tmp/vc/block",
      graft.dedup.VideoCatalog.blockKind(4)).count(),
      ExactCatalog.read(spark, s"$tmp/vc/sig",
        graft.dedup.VideoCatalog.sigKind(4)).count()) == before)
    // misconfiguration fails loudly
    val boom = intercept[IllegalArgumentException] {
      StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, videoCol = Some("avi")))
    }
    assert(boom.getMessage.contains("videoDir"))
  }

  test("optional stats surface: curated-output n-grams accumulate across triggers, replay merges once") {
    val (e, n, s) = dirs("stats")
    val sd = Files.createTempDirectory("graft-curate-stats").toString
    val out1 = StreamingCurate.applyBatch(b1.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, statsDir = Some(sd)),
      added = 1L)
    val out2 = StreamingCurate.applyBatch(b2.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, statsDir = Some(sd)),
      added = 2L)
    // the accumulators hold exactly the delivered outputs' gram stream
    def gramsOf(df: org.apache.spark.sql.DataFrame) =
      StreamingSketch.wordNgramItems(df.select($"clean_text"), "clean_text", 3)
        .as[String].collect().toSeq
    val all = gramsOf(out1) ++ gramsOf(out2)
    val cms = StreamingSketch.read(spark, s"$sd/cms").get
    assert(cms.totalCount() == all.size.toLong)
    val top = all.groupBy(identity).maxBy(g => (g._2.size, g._1))
    assert(cms.estimateCount(top._1) >= top._2.size.toLong)
    val est = StreamingDistinct.estimate(spark, s"$sd/hll")
    assert(math.abs(est - all.distinct.size) < 1.0, s"hll $est vs ${all.distinct.size}")
    // a replayed trigger merges NOTHING (both stores tag added)
    val _ = StreamingCurate.applyBatch(b2.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, statsDir = Some(sd)),
      added = 2L)
    assert(StreamingSketch.read(spark, s"$sd/cms").get.totalCount() ==
      all.size.toLong)
    assert(StreamingDistinct.estimate(spark, s"$sd/hll") == est)
    // the quantile leg: every delivered doc's length folded, replay
    // included nothing, and the median bracket contains the true median
    val nDocs = rows(out1).size + rows(out2).size
    assert(StreamingHistogram.totalCount(spark, s"$sd/hist") == nDocs.toLong)
    val lens = (rows(out1) ++ rows(out2)).map(_._4.length).sorted
    val median = lens(math.ceil(0.5 * nDocs).toInt - 1).toDouble
    val (lo, hi) = StreamingHistogram.quantileBracket(spark, s"$sd/hist", 0.5).get
    assert(lo <= median && median < hi, s"median $median outside [$lo, $hi)")
  }

  test("decontamination runs BEFORE the media tiers: contaminated media never enters the catalogs") {
    import graft.functions.ImageFixtures
    val (e, n, s) = dirs("dcimg")
    val tmp = Files.createTempDirectory("graft-curate-dcimg").toString
    val reg = s"$tmp/reg"
    StreamingDecontam.register(
      Seq(900L -> "the secret benchmark answer is forty two exactly")
        .toDF("doc_id", "text"), reg, "text")
    def img(seed: Long) = ImageFixtures.syntheticPng(seed, 0)
    // doc 20 is contaminated AND carries image 20; doc 21 is clean with
    // the SAME image. If decontam ran after the image tiers, doc 20
    // would enter the image catalogs and permanently suppress doc 21.
    val batch = Seq(
      (20L, "students leaked the benchmark answer is printed in books", img(20)),
      (21L, "a perfectly clean training document about the weather today", img(20)))
      .toDF("doc_id", "text", "img")
    val out = rows(StreamingCurate.applyBatch(batch,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
        decontamDir = Some(reg), imageCol = Some("img"),
        imageExactDir = Some(s"$tmp/ie"), imagePhashDir = Some(s"$tmp/ip")),
      added = 0L))
    assert(out.map(_._1).toSet == Set(21L),
      s"contaminated doc must drop, clean same-image doc must survive; got ${out.map(_._1)}")
    // exactly ONE image entered the exact image catalog (doc 21's)
    assert(ExactCatalog.read(spark, s"$tmp/ie",
      graft.dedup.ImageCatalog.KindExact).count() == 1)
  }

  test("optional decontamination tier: eval-overlapping docs drop FIRST, the registry never advances") {
    val (e, n, s) = dirs("dc")
    val reg = Files.createTempDirectory("graft-curate-dc").toString + "/reg"
    StreamingDecontam.register(
      Seq(900L -> "the secret benchmark answer is forty two exactly")
        .toDF("doc_id", "text"), reg, "text")
    val _ = StreamingCurate.applyBatch(b1.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, decontamDir = Some(reg)),
      added = 0L)
    val d2 = Seq(
      // carries the eval trigram "benchmark answer is" in fresh text —
      // only the decontam tier can drop it
      20L -> "students leaked the benchmark answer is printed in books",
      21L -> "a perfectly clean training document about the weather today")
      .toDF("doc_id", "text")
    val out = rows(StreamingCurate.applyBatch(d2,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W, decontamDir = Some(reg)),
      added = 1L))
    assert(out.map(_._1).toSet == Set(21L),
      s"decontam tier must drop 20, got ${out.map(_._1)}")
    // dropped BEFORE the exact tier: doc 20's text never entered the
    // exact catalog (its fingerprint is absent)
    import org.apache.spark.sql.functions.{col, lit}
    val fp20 = spark.range(1).select(graft.functions.GraftFunctions
      .fingerprint64(lit(d2.collect()(0).getString(1))).as("fp"))
      .head.getLong(0)
    assert(ExactCatalog.read(spark, e).filter(col("fp") === fp20).count() == 0)
  }

  test("optional mp4 tier: a re-muxed container drops after the perceptual media tiers") {
    import graft.functions.Mp4Fixtures
    val (e, n, s) = dirs("mp4")
    val tmp = Files.createTempDirectory("graft-curate-mp4cat").toString
    def mp4(seed: Long, v: Int = 0) = Mp4Fixtures.syntheticMp4(seed, v)
    val d1 = Seq((1L, b1.head._2, mp4(1)), (2L, b1(1)._2, mp4(2)))
      .toDF("doc_id", "text", "mp4")
    val cfg = StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
      mp4Col = Some("mp4"), mp4Dir = Some(s"$tmp/mc"))
    val _ = StreamingCurate.applyBatch(d1, cfg, added = 0L)
    // 90 = fresh text but a RE-MUX of doc 1's container (only the mp4
    // tier can drop it); 91 = fresh on both axes
    val d2 = Seq(
      (90L, "totally new text that only the mdat signature could reject", mp4(1, 1)),
      (91L, "a genuinely novel document with genuinely novel media", mp4(91)))
      .toDF("doc_id", "text", "mp4")
    val out = rows(StreamingCurate.applyBatch(d2, cfg, added = 1L))
    assert(out.map(_._1).toSet == Set(91L),
      s"mp4 tier must drop 90, got ${out.map(_._1)}")
    // crash contract covers the mp4 catalog too
    val before = ExactCatalog.read(spark, s"$tmp/mc",
      graft.dedup.Mp4Dedup.Kind).count()
    val _2 = intercept[RuntimeException] {
      StreamingCurate.applyBatch(
        Seq((95L, "another fresh doc", mp4(95))).toDF("doc_id", "text", "mp4"),
        cfg, added = 2L, deliver = _ => throw new RuntimeException("down"))
    }
    assert(ExactCatalog.read(spark, s"$tmp/mc",
      graft.dedup.Mp4Dedup.Kind).count() == before)
    // misconfiguration fails loudly
    val boom = intercept[IllegalArgumentException] {
      StreamingCurate.applyBatch(d2,
        StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
          mp4Col = Some("mp4")))
    }
    assert(boom.getMessage.contains("mp4Dir"))
  }

  test("optional mp3 tier: a re-tagged stream drops after the perceptual media tiers") {
    import graft.functions.Mp3Fixtures
    val (e, n, s) = dirs("mp3")
    val tmp = Files.createTempDirectory("graft-curate-mp3cat").toString
    def mp3(seed: Long, v: Int = 0) = Mp3Fixtures.syntheticMp3(seed, v)
    val d1 = Seq((1L, b1.head._2, mp3(1)), (2L, b1(1)._2, mp3(2)))
      .toDF("doc_id", "text", "mp3")
    val cfg = StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
      mp3Col = Some("mp3"), mp3Dir = Some(s"$tmp/mc"))
    val _ = StreamingCurate.applyBatch(d1, cfg, added = 0L)
    // 90 = fresh text but a RE-TAG of doc 1's stream (only the mp3
    // tier can drop it); 91 = fresh on both axes
    val d2 = Seq(
      (90L, "totally new text that only the frame signature could reject", mp3(1, 1)),
      (91L, "a genuinely novel document with genuinely novel media", mp3(91)))
      .toDF("doc_id", "text", "mp3")
    val out = rows(StreamingCurate.applyBatch(d2, cfg, added = 1L))
    assert(out.map(_._1).toSet == Set(91L),
      s"mp3 tier must drop 90, got ${out.map(_._1)}")
    // crash contract covers the mp3 catalog too
    val before = ExactCatalog.read(spark, s"$tmp/mc",
      graft.dedup.Mp3Dedup.Kind).count()
    val _2 = intercept[RuntimeException] {
      StreamingCurate.applyBatch(
        Seq((95L, "another fresh doc", mp3(95))).toDF("doc_id", "text", "mp3"),
        cfg, added = 2L, deliver = _ => throw new RuntimeException("down"))
    }
    assert(ExactCatalog.read(spark, s"$tmp/mc",
      graft.dedup.Mp3Dedup.Kind).count() == before)
    // misconfiguration fails loudly
    val boom = intercept[IllegalArgumentException] {
      StreamingCurate.applyBatch(d2,
        StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
          mp3Col = Some("mp3")))
    }
    assert(boom.getMessage.contains("mp3Dir"))
  }

  test("multiple decontam registries through the config probe in one pass") {
    val (e, n, s) = dirs("dcmulti")
    val tmp = Files.createTempDirectory("graft-curate-dcm").toString
    StreamingDecontam.register(
      Seq(900L -> "the secret benchmark answer is forty two exactly")
        .toDF("doc_id", "text"), s"$tmp/r1", "text")
    StreamingDecontam.register(
      Seq(901L -> "rivers flow downhill to the sea at last")
        .toDF("doc_id", "text"), s"$tmp/r2", "text", n = 4)
    val batch = Seq(
      20L -> "students leaked the benchmark answer is printed in books", // r1
      21L -> "all rivers flow downhill to the sea at last tonight",      // r2
      22L -> "a perfectly clean training document about the weather")
      .toDF("doc_id", "text")
    val out = rows(StreamingCurate.applyBatch(batch,
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W,
        decontamDirs = Seq(s"$tmp/r1", s"$tmp/r2")), added = 0L))
    assert(out.map(_._1).toSet == Set(22L),
      s"both registries must filter, got ${out.map(_._1)}")
  }

  test("crash contract: a failed final delivery advances NO catalog") {
    val (e, n, s) = dirs("crash")
    val _ = StreamingCurate.applyBatch(b1.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W),
      added = 0L)
    val before = catCounts(e, n, s)
    val boom = intercept[RuntimeException] {
      StreamingCurate.applyBatch(b2.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W),
      added = 1L, deliver = _ => throw new RuntimeException("sink down"))
    }
    assert(boom.getMessage == "sink down")
    assert(catCounts(e, n, s) == before,
      "no tier's append may land before the final delivery")
    // replay after the crash delivers the full correct batch
    val replay = rows(StreamingCurate.applyBatch(b2.toDF("doc_id", "text"),
      StreamingCurate.CurateConfig(e, n, s, "doc_id", "text", W),
      added = 1L))
    val ids = replay.map(_._1).toSet
    assert(ids == Set(12L, 13L, 14L))
    assert(catCounts(e, n, s) != before)
  }
}
