package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.functions.{FlacFixtures, FlacKernels}

class FlacDedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-flac-spec").toString

  private def tracks(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("id", "flac")

  test("stream signature: re-tag invariant, payload-sensitive, null off the format") {
    val a0 = FlacFixtures.syntheticFlac(1L, 0)
    val a1 = FlacFixtures.syntheticFlac(1L, 1) // re-tag of a0
    val b0 = FlacFixtures.syntheticFlac(2L, 0)
    assert(!java.util.Arrays.equals(a0, a1),
      "the re-tag must differ bytewise or the tier proves nothing")
    val sa0 = FlacKernels.streamSig(a0)
    val sa1 = FlacKernels.streamSig(a1)
    assert(sa0 == sa1, "same frame region must sign identically across tags")
    assert(sa0 != FlacKernels.streamSig(b0))
    // a single flipped frame byte changes the signature
    val flipped = a0.clone()
    flipped(a0.length - 1) = (flipped(a0.length - 1) ^ 1).toByte
    assert(FlacKernels.streamSig(flipped) != sa0)
    // non-FLAC, truncated chain, and metadata-only stubs are null
    assert(FlacKernels.streamSig("not audio".getBytes) == null)
    assert(FlacKernels.streamSig(java.util.Arrays.copyOf(a0, 6)) == null)
    // a block whose declared length runs past the buffer is malformed
    val truncated = java.util.Arrays.copyOf(a0, 20)
    assert(FlacKernels.streamSig(truncated) == null)
    // metadata-only (chain complete, zero frame bytes) carries no audio
    val metaOnly = java.util.Arrays.copyOf(a1, a1.length -
      FlacKernels.streamSig(a1).getLong(2).toInt)
    assert(FlacKernels.streamSig(metaOnly) == null)
  }

  test("stream signature: invariance under RANDOM metadata chains (property)") {
    import org.scalacheck.{Gen, Prop}
    def block(last: Boolean, tpe: Int, body: Array[Byte]): Array[Byte] =
      Array((((if (last) 0x80 else 0) | tpe) & 0xff).toByte,
        ((body.length >> 16) & 0xff).toByte, ((body.length >> 8) & 0xff).toByte,
        (body.length & 0xff).toByte) ++ body
    val bodyGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 80)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes.toArray
    val gen = for {
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      tpes1 <- Gen.listOf(Gen.oneOf(1, 4, 6)).map(_.take(3)) // PADDING/COMMENT/PICTURE
      bodies1 <- Gen.listOfN(3, bodyGen)
      tpes2 <- Gen.listOf(Gen.oneOf(1, 4, 6)).map(_.take(3))
      bodies2 <- Gen.listOfN(3, bodyGen)
      si <- bodyGen.map(b => java.util.Arrays.copyOf(b, 34)) // any 34-byte STREAMINFO
    } yield (seed, tpes1.zip(bodies1), tpes2.zip(bodies2), si)
    graft.PropCheck.check(Prop.forAll(gen) {
      case (seed, tags1, tags2, si) =>
        // frame region from the fixture (drop its own header/metadata)
        val base = FlacFixtures.syntheticFlac(seed, 0)
        val frames = base.drop(4 + 4 + 34)
        val magic = Array[Byte]('f', 'L', 'a', 'C')
        def file(tags: Seq[(Int, Array[Byte])]): Array[Byte] = {
          val mid = tags.map { case (t, b) => block(last = false, t, b) }
          magic ++ block(last = false, 0, si) ++
            mid.foldLeft(Array.empty[Byte])(_ ++ _) ++
            block(last = true, 1, Array.empty[Byte]) ++ frames
        }
        val s1 = FlacKernels.streamSig(file(tags1))
        val s2 = FlacKernels.streamSig(file(tags2))
        s1 != null && s1 == s2 && s1.getLong(2) == frames.length.toLong
    })
  }

  test("meta: STREAMINFO geometry, tag-wrap invariant, packed-bit edges") {
    val m0 = FlacKernels.flacMeta(FlacFixtures.syntheticFlac(5L, 0))
    val m1 = FlacKernels.flacMeta(FlacFixtures.syntheticFlac(5L, 1))
    assert(m0 == m1, "tags must not change any metadata field")
    // seed 5: rate idx 5%3=2 → 96000, channels 5%2+1=2, bits (5%4=1)→16,
    // samples 5%100000+1=6
    assert(m0.getInt(0) == 96000 && m0.getInt(1) == 2 &&
      m0.getInt(2) == 16 && m0.getLong(3) == 6L)
    // packed-bit edges: 8 channels, 32 bits, a >2^32 sample count
    def si(rate: Int, ch: Int, bits: Int, samples: Long): Array[Byte] = {
      val b = new Array[Byte](34)
      b(10) = ((rate >> 12) & 0xff).toByte
      b(11) = ((rate >> 4) & 0xff).toByte
      b(12) = (((rate & 0xf) << 4) | (((ch - 1) & 0x7) << 1) |
        (((bits - 1) >> 4) & 0x1)).toByte
      b(13) = ((((bits - 1) & 0xf) << 4) | ((samples >> 32) & 0xf)).toInt.toByte
      b(14) = ((samples >> 24) & 0xff).toByte
      b(15) = ((samples >> 16) & 0xff).toByte
      b(16) = ((samples >> 8) & 0xff).toByte
      b(17) = (samples & 0xff).toByte
      b
    }
    def file(body: Array[Byte]): Array[Byte] =
      Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++ body ++
        Array[Byte](1, 2, 3)
    val edge = FlacKernels.flacMeta(file(si(192000, 8, 32, (1L << 35) + 7)))
    assert(edge != null)
    assert(edge.getInt(0) == 192000 && edge.getInt(1) == 8 &&
      edge.getInt(2) == 32 && edge.getLong(3) == (1L << 35) + 7)
    // zero sample rate is invalid per spec; non-STREAMINFO first block too
    assert(FlacKernels.flacMeta(file(si(0, 2, 16, 1L))) == null)
    val wrongFirst = file(si(44100, 2, 16, 1L))
    wrongFirst(4) = 0x84.toByte // type 4 first
    assert(FlacKernels.flacMeta(wrongFirst) == null)
  }

  test("cross-batch drops and in-batch collapse through the SigDedup binding") {
    val dir = tmpDir() + "/cat"
    val _ = FlacDedup.applyBatch(
      tracks((0L, FlacFixtures.syntheticFlac(10L, 0)),
        (1L, FlacFixtures.syntheticFlac(11L, 0))),
      dir, "id", "flac", added = 0L)
    val batch = tracks(
      (100L, FlacFixtures.syntheticFlac(10L, 0)), // byte copy → drops
      (101L, FlacFixtures.syntheticFlac(11L, 1)), // re-tag → drops
      (102L, FlacFixtures.syntheticFlac(12L, 0)), // fresh → survives
      (103L, FlacFixtures.syntheticFlac(12L, 1))) // in-batch re-tag of 102
      .unionByName(Seq((9L, "junk".getBytes)).toDF("id", "flac"))
    var delivered: Set[Long] = null
    val out = graft.streaming.StreamingFlacDedup.applyBatch(
      batch, dir, "id", "flac", added = 1L,
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(9L, 102L))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay: survivors are now catalog members; junk never is
    assert(graft.streaming.StreamingFlacDedup.applyBatch(
      batch, dir, "id", "flac", added = 2L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(9L))
    // kind guard
    val e = intercept[IllegalArgumentException] { ExactCatalog.read(spark, dir) }
    assert(e.getMessage.contains(FlacDedup.Kind))
    // versioned root: re-tag of a v1 survivor drops across the cutover
    val root = tmpDir() + "/vroot"
    val s1 = graft.streaming.StreamingFlacDedup.applyBatchVersioned(
      tracks((0L, FlacFixtures.syntheticFlac(50L, 0))), root, "id", "flac",
      numBuckets = 4, added = 1L)
    assert(s1.count() == 1)
    assert(graft.streaming.StreamingFlacDedup.applyBatchVersioned(
      tracks((100L, FlacFixtures.syntheticFlac(50L, 1))), root, "id", "flac",
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64)).count() == 0)
  }
}
