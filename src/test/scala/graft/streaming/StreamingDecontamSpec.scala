package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.dedup.ExactCatalog

class StreamingDecontamSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val evalDocs = Seq(
    100L -> "the capital of france is paris obviously",
    101L -> "two plus two equals four in base ten").toDF("doc_id", "text")

  test("eval overlap drops at minHits; clean docs survive; the registry never advances") {
    val dir = Files.createTempDirectory("graft-dc").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    val batch = Seq(
      1L -> "the capital of france is paris obviously", // exact eval copy
      // carries ONE eval trigram ("plus two equals") in fresh text
      2L -> "students wrote plus two equals on the board today",
      3L -> "a wholly unrelated training document about rivers").toDF("doc_id", "text")
    var delivered: Set[Long] = null
    val out = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text",
      deliver = d => delivered = d.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(3L))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))
    // minHits = 2: the single-trigram doc now passes, the full copy drops
    assert(StreamingDecontam.applyBatch(batch, dir, "doc_id", "text",
      minHits = 2L).select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    // READ-ONLY: the probe added nothing to the registry
    val regCount = ExactCatalog.read(spark, dir,
      kind = StreamingDecontam.kindFor(3)).count()
    val _ = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
    assert(ExactCatalog.read(spark, dir,
      kind = StreamingDecontam.kindFor(3)).count() == regCount)
  }

  test("n is a layout property: meta-derived width wins over a divergent caller") {
    val dir = Files.createTempDirectory("graft-dc-n").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text", n = 3)
    assert(StreamingDecontam.metaN(spark, dir).contains(3))
    // caller passes n=5 — the probe still shingles at the registry's 3,
    // so the eval copy drops
    val out = StreamingDecontam.applyBatch(
      Seq(1L -> evalDocs.as[(Long, String)].head()._2).toDF("doc_id", "text"),
      dir, "doc_id", "text", n = 5)
    assert(out.count() == 0)
  }

  test("normalization: case/punctuation reflows of eval text still drop") {
    val dir = Files.createTempDirectory("graft-dc-nm").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    val batch = Seq(
      // the GPT-3-appendix evasion shapes: case flip, punctuation reflow,
      // both at once — every normalized gram matches the registry
      1L -> "The Capital of France is Paris, obviously!",
      2L -> "TWO PLUS TWO EQUALS FOUR... in base ten?!",
      3L -> "the,capital,of,france,is,paris,obviously",
      4L -> "a wholly unrelated training document about rivers").toDF("doc_id", "text")
    val out = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("a zero-normalized-token eval set never false-drops other token-less docs") {
    val dir = Files.createTempDirectory("graft-dc-empty").toString + "/reg"
    // pure punctuation/symbol eval docs: zero normalized tokens even
    // under the Unicode fold (nothing here is a letter or digit), so
    // the degrade gram is "" — which must NOT enter the registry
    StreamingDecontam.register(Seq(
      900L -> "!!! ... ???",
      901L -> "¶ § …—– ©®™").toDF("doc_id", "text"), dir, "text")
    assert(graft.dedup.ExactCatalog.read(spark, dir,
      kind = StreamingDecontam.kindFor(3)).count() == 0,
      "an all-separator eval set registers nothing")
    // unrelated token-less training docs pass (no "" match), real-token
    // docs obviously pass too
    val batch = Seq(
      1L -> "完全不同的培训文本",
      2L -> ", , , ,",
      3L -> "a perfectly ordinary ascii training document").toDF("doc_id", "text")
    assert(StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
      .count() == 3)
    // ...and batch empty-degrades never count as hits against a REAL
    // registry either
    val dir2 = Files.createTempDirectory("graft-dc-empty2").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir2, "text")
    assert(StreamingDecontam.applyBatch(
      Seq(4L -> "。。。").toDF("doc_id", "text"), dir2, "doc_id", "text")
      .count() == 1)
  }

  test("multilingual: non-Latin eval text drops its reflowed copies, controls survive") {
    val dir = Files.createTempDirectory("graft-dc-uni").toString + "/reg"
    // the r14 hole: under the ASCII fold ALL of these registered zero
    // grams and the tier protected nothing outside English
    StreamingDecontam.register(Seq(
      900L -> "人工智能正在改变世界的面貌",                          // zh: char shingles
      901L -> "Быстрая бурая лиса прыгает через ленивую собаку",   // ru: cased words
      902L -> "東京タワーの高さは三百三十三メートル",                 // ja: mixed scripts
      903L -> "인공지능은 세상의 모습을 빠르게 바꾸고 있다"            // ko: spaced Hangul
    ).toDF("doc_id", "text"), dir, "text")
    val batch = Seq(
      // reflowed copies — every one must drop
      1L -> "人工智能，正在改变，世界的面貌。",                       // punct injected
      2L -> "БЫСТРАЯ, БУРАЯ ЛИСА, ПРЫГАЕТ, ЧЕРЕЗ, ЛЕНИВУЮ, СОБАКУ!!", // case+reflow
      3L -> "東京タワー、の高さ、は三百三十三、メートル",               // punct injected
      4L -> "인공지능은세상의모습을빠르게바꾸고있다",                   // spaces removed
      // a PARTIAL leak: three consecutive Chinese chars from the eval
      // doc inside fresh text — one shared char-3-gram is enough
      5L -> "本文讨论改变世界这一主题",
      // controls — registered nowhere, must survive
      6L -> "量子计算机尚未成熟但潜力巨大",
      7L -> "Медленный зеленый кот спит под столом весь день",
      8L -> "a perfectly ordinary ascii training document").toDF("doc_id", "text")
    val out = StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(6L, 7L, 8L))
  }

  test("duplicate registry rows never inflate the hit count past minHits") {
    val dir = Files.createTempDirectory("graft-dc-dup").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    StreamingDecontam.register(evalDocs, dir, "text", added = 1L) // every row twice
    // shares exactly ONE eval trigram — with row-counted hits the
    // duplicated registry would count it twice and wrongly drop at
    // minHits = 2
    val batch = Seq(
      2L -> "students wrote plus two equals on the board today").toDF("doc_id", "text")
    assert(StreamingDecontam.applyBatch(batch, dir, "doc_id", "text",
      minHits = 2L).count() == 1)
    // ... while a genuinely-two-gram doc still drops at minHits = 2
    val twoGrams = Seq(
      5L -> "plus two equals four was scribbled there").toDF("doc_id", "text")
    assert(StreamingDecontam.applyBatch(twoGrams, dir, "doc_id", "text",
      minHits = 2L).count() == 0)
  }

  test("multi-registry probe equals sequential application") {
    val root = Files.createTempDirectory("graft-dc-mu").toString
    val evalA = Seq(100L -> "the capital of france is paris").toDF("doc_id", "text")
    val evalB = Seq(200L -> "rivers flow downhill to the sea at last").toDF("doc_id", "text")
    StreamingDecontam.register(evalA, s"$root/a", "text", n = 3)
    StreamingDecontam.register(evalB, s"$root/b", "text", n = 4)
    val batch = Seq(
      1L -> "the capital of france is paris obviously",  // hits A only
      2L -> "all rivers flow downhill to the sea at last",// hits B only
      3L -> "the capital of france is where rivers flow downhill to the sea at last", // both
      4L -> "nothing shared with either eval set").toDF("doc_id", "text")
    val multi = StreamingDecontam.applyBatchMulti(
      batch, Seq(s"$root/a", s"$root/b"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sequential = StreamingDecontam.applyBatch(
      StreamingDecontam.applyBatch(batch, s"$root/a", "doc_id", "text"),
      s"$root/b", "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(multi == sequential)
    assert(multi == Set(4L))
    // empty dirs is the identity
    assert(StreamingDecontam.applyBatchMulti(
      batch, Seq.empty, "doc_id", "text").count() == 4)
  }

  test("v1 raw-gram and v2 ASCII-fold registries refuse loudly, never match nothing") {
    // v1: pre-normalization kind tag
    val dir = Files.createTempDirectory("graft-dc-v1").toString + "/reg"
    ExactCatalog.append(
      StreamingDecontam.evalEntriesOf(evalDocs, "text", 3), dir,
      kind = "decontam_gram_n3")
    val e = intercept[IllegalArgumentException] {
      StreamingDecontam.applyBatch(
        Seq(1L -> "anything").toDF("doc_id", "text"), dir, "doc_id", "text")
        .count()
    }
    assert(e.getMessage.contains("decontam_gram_n3"))
    // v2: the ASCII-fold `_norm` kind — same fingerprints for pure-ASCII
    // grams, but a DIFFERENT universe for everything else (non-Latin
    // text had zero grams), so silently accepting it would resurrect
    // the r14 blind spot for any registry built before the widening
    val dir2 = Files.createTempDirectory("graft-dc-v2").toString + "/reg"
    ExactCatalog.append(
      StreamingDecontam.evalEntriesOf(evalDocs, "text", 3), dir2,
      kind = "decontam_gram_n3_norm")
    val e2 = intercept[IllegalArgumentException] {
      StreamingDecontam.applyBatch(
        Seq(1L -> "anything").toDF("doc_id", "text"), dir2, "doc_id", "text")
        .count()
    }
    assert(e2.getMessage.contains("decontam_gram_n3_norm"))
  }

  test("migrateRegistry: stale-kind refusal -> one call -> green resume; idempotent on current") {
    val dir = Files.createTempDirectory("graft-dc-mig").toString + "/reg"
    // a v2 ASCII-fold registry (the pre-Unicode universe)
    ExactCatalog.append(
      StreamingDecontam.evalEntriesOf(evalDocs, "text", 3), dir,
      kind = "decontam_gram_n3_norm")
    val batch = Seq(
      1L -> "the capital of france is paris obviously", // contaminated
      2L -> "a wholly unrelated training document").toDF("doc_id", "text")
    // before: the stream's next trigger refuses loudly
    intercept[IllegalArgumentException] {
      StreamingDecontam.applyBatch(batch, dir, "doc_id", "text").count()
    }
    // the one-call migration (rebuild from the eval corpus + swap)
    assert(StreamingDecontam.migrateRegistry(evalDocs, dir, "text"))
    // after: same dir, same checkpoint semantics — probe is green and
    // drops the contaminated doc
    assert(StreamingDecontam.applyBatch(batch, dir, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    // idempotent: a second call is a no-op on a current registry
    assert(!StreamingDecontam.migrateRegistry(evalDocs, dir, "text"))
    assert(StreamingDecontam.metaN(spark, dir).contains(3))
    // missing dir: registers fresh (deploy-script safe)
    val fresh = Files.createTempDirectory("graft-dc-mig2").toString + "/reg"
    assert(StreamingDecontam.migrateRegistry(evalDocs, fresh, "text"))
    assert(StreamingDecontam.applyBatch(batch, fresh, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("kind universe guard both ways; an empty registry passes everything") {
    val dir = Files.createTempDirectory("graft-dc-k").toString + "/reg"
    StreamingDecontam.register(evalDocs, dir, "text")
    val e = intercept[IllegalArgumentException] { ExactCatalog.read(spark, dir) }
    assert(e.getMessage.contains(StreamingDecontam.kindFor(3)))
    val empty = Files.createTempDirectory("graft-dc-e").toString + "/none"
    assert(StreamingDecontam.applyBatch(
      Seq(1L -> "anything at all goes through").toDF("doc_id", "text"),
      empty, "doc_id", "text").count() == 1)
  }
}
