package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{AudioFixtures, AudioKernels}

class AudioDedupSpec extends AnyFunSuite with SparkTestBase {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("PCM decode: real RIFF/WAVE samples, mono mix, clamped reads, junk -> null") {
    val wav = AudioFixtures.syntheticWav(3L, 0)
    val s = AudioKernels.pcmMono(wav)
    assert(s != null && s.length == 65 * 64)
    assert(s.forall(v => v >= -1.0 && v <= 1.0))
    // WavKernels (header walk) agrees on the geometry
    val meta = graft.functions.WavKernels.wavMeta(wav)
    assert(meta.getInt(0) == 1 && meta.getInt(1) == 8000 && meta.getInt(2) == 16)
    assert(AudioKernels.pcmMono("junk".getBytes) == null)
    assert(AudioKernels.pcmMono(null) == null)
    // a truncated payload decodes its prefix instead of throwing
    val cut = java.util.Arrays.copyOf(wav, wav.length / 2)
    val sc = AudioKernels.pcmMono(cut)
    assert(sc != null && sc.length > 0 && sc.length < s.length)
  }

  test("envelope hash: volume-invariant, seed-separated, stable under 16-bit rounding") {
    val seeds = (0L until 200L).toSeq
    val hashes = seeds.map(s =>
      AudioKernels.envelopeHash64(AudioFixtures.syntheticWav(s, 0)).longValue())
    // HALF-VOLUME variant: different bytes, IDENTICAL hash — the
    // invariance that makes it a perceptual hash rather than a checksum
    seeds.foreach { s =>
      val half = AudioKernels.envelopeHash64(AudioFixtures.syntheticWav(s, 1))
      assert(half.longValue() == hashes(s.toInt), s"seed $s")
      assert(!AudioFixtures.syntheticWav(s, 1).sameElements(
        AudioFixtures.syntheticWav(s, 0)))
    }
    // distinct seeds: ~Binomial(64, 1/2) apart; floor 12 as for pHash
    val minH = (for {
      i <- seeds.indices; j <- seeds.indices if i < j
    } yield hamming(hashes(i), hashes(j))).min
    assert(minH > 12, s"min pairwise Hamming $minH")
    // short or non-PCM payloads hash to null, never throw
    assert(AudioKernels.envelopeHash64("junk".getBytes) == null)
    assert(AudioKernels.envelopeHash64(null) == null)
  }

  private def recs(ids: Seq[Long], seedOf: Long => Long,
      variantOf: Long => Int = _ => 0): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, AudioFixtures.syntheticWav(seedOf(i), variantOf(i))))
      .toDF("id", "wav")
  }

  test("candidate pairs find exactly the planted volume-scaled copies") {
    // 30 recordings; ids 100..104 are half-volume copies of 0..4
    val df = recs(0L until 30L, identity)
      .unionByName(recs(100L until 105L, _ - 100L, _ => 1))
    val pairs = AudioDedup.envelopeCandidatePairs(df, "id", "wav")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 5L).map(i => (i, i + 100L)).toSet)
  }

  test("catalog: cross-batch envelope drops, fresh kept, kind refuses image readers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audcat").toString + "/env"
    // prior corpus: seeds 0..19
    val _ = AudioDedup.applyBatchEnvelope(
      recs(0L until 20L, identity), dir, "id", "wav", added = 1L)
    // batch: half-volume near-dups of 0..4 (drop), fresh 500..504 (keep),
    // one junk payload (passes through)
    import spark.implicits._
    val batch = recs(200L until 205L, _ - 200L, _ => 1)
      .unionByName(recs(500L until 505L, identity))
      .unionByName(Seq((900L, "not audio".getBytes)).toDF("id", "wav"))
    var delivered: Set[Long] = null
    val out = AudioDedup.applyBatchEnvelope(batch, dir, "id", "wav", added = 2L,
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == (500L until 505L).toSet + 900L)
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay suppressive
    assert(AudioDedup.applyBatchEnvelope(
      recs(600L until 605L, _ - 100L), dir, "id", "wav", added = 3L)
      .count() == 0) // same seeds as 500..504 -> identical envelopes
    // universe guard: an image-phash reader refuses the audio catalog
    val e = intercept[IllegalArgumentException] {
      ExactCatalog.readForBatch(spark, dir,
        spark.range(1).select(col("id").as("fp")),
        kind = ImageCatalog.KindPhash)
    }
    assert(e.getMessage.contains("audio_env_q16"))
  }

  test("versioned root: tripped maintenance cuts the stream over mid-flight, state intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-aud-vroot")
      .toString + "/vroot"
    // trigger 1 bootstraps v1 from an empty root
    val s1 = graft.streaming.StreamingAudioDedup.applyBatchVersioned(
      recs(0L until 6L, identity), root, "id", "wav",
      numBuckets = 4, added = 1L)
    assert(s1.count() == 6)
    assert(graft.ops.VersionedStore.current(spark, root,
      d => ExactCatalog.readMeta(spark, d).isDefined)
      .contains(graft.ops.VersionedStore.versionDir(root, 1)))
    // trigger 2 on the maintenance cadence with a tight byte target:
    // Rebucket trips and EXECUTES into v2 mid-stream (half-volume
    // re-encodes of v1 survivors drop before the cutover)
    val s2 = graft.streaming.StreamingAudioDedup.applyBatchVersioned(
      recs(100L until 103L, _ - 100L, _ => 1), root, "id", "wav",
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(s2.count() == 0)
    val serving = graft.ops.VersionedStore.current(spark, root,
      d => ExactCatalog.readMeta(spark, d).isDefined).get
    assert(serving == graft.ops.VersionedStore.versionDir(root, 2))
    assert(!new java.io.File(graft.ops.VersionedStore.versionDir(root, 1))
      .exists(), "retired predecessor must be swept")
    // the rebucketed catalog still carries the envelope universe tag
    assert(ExactCatalog.readMetaKind(spark, serving)
      .contains(AudioDedup.KindEnvelope))
    // trigger 3 probes the NEW version with default args
    assert(graft.streaming.StreamingAudioDedup.applyBatchVersioned(
      recs(200L until 203L, _ - 200L), root, "id", "wav",
      added = 3L).count() == 0)
  }
}
