package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.functions.{Mp3Fixtures, Mp3Kernels}

class Mp3DedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mp3-spec").toString

  private def tracks(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("id", "mp3")

  test("frame signature: re-tag invariant, payload-sensitive, null off the format") {
    val a0 = Mp3Fixtures.syntheticMp3(1L, 0)
    val a1 = Mp3Fixtures.syntheticMp3(1L, 1) // re-tag of a0
    val b0 = Mp3Fixtures.syntheticMp3(2L, 0)
    assert(!java.util.Arrays.equals(a0, a1),
      "the re-tag must differ bytewise or the tier proves nothing")
    val sa0 = Mp3Kernels.framesSig(a0)
    val sa1 = Mp3Kernels.framesSig(a1)
    val sb0 = Mp3Kernels.framesSig(b0)
    assert(sa0 == sa1, "same frame stream must sign identically across tags")
    assert(sa0 != sb0, "different frame streams must sign differently")
    assert(sa0.getLong(2) == a0.length.toLong,
      "audio_bytes of the untagged variant is the whole payload")
    // non-MP3, truncated, and frame-less payloads are null
    assert(Mp3Kernels.framesSig("just some text".getBytes) == null)
    assert(Mp3Kernels.framesSig(java.util.Arrays.copyOf(a0, 100)) == null)
    assert(Mp3Kernels.framesSig(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0))
      == null)
    // a single flipped payload byte changes the signature
    val flipped = a0.clone()
    flipped(a0.length / 2) = (flipped(a0.length / 2) ^ 1).toByte
    assert(Mp3Kernels.framesSig(flipped) != sa0)
  }

  test("frame signature: invariance under RANDOM tag layouts (property)") {
    import org.scalacheck.{Gen, Prop}
    // a generic re-tagger: same frames, random stacked ID3v2 prefixes
    // (random sizes/contents) and an optional random ID3v1 trailer —
    // everything a real tag editor touches
    def id3v2(body: Array[Byte]): Array[Byte] = {
      require(body.length < 128) // single syncsafe byte is plenty here
      Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, body.length.toByte) ++ body
    }
    val tagGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 100)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield id3v2(bytes.toArray)
    val gen = for {
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      pre1 <- Gen.listOf(tagGen).map(_.take(3))
      pre2 <- Gen.listOf(tagGen).map(_.take(3))
      v1a <- Gen.oneOf(true, false)
      v1b <- Gen.oneOf(true, false)
      junk <- Gen.listOfN(125, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (seed, pre1, pre2, v1a, v1b, junk.toArray)
    graft.PropCheck.check(Prop.forAll(gen) {
      case (seed, pre1, pre2, v1a, v1b, junk) =>
        val frames = Mp3Fixtures.syntheticMp3(seed, 0)
        val trailer = Array[Byte]('T', 'A', 'G') ++ junk
        def wrap(pre: Seq[Array[Byte]], v1: Boolean) =
          pre.foldLeft(Array.empty[Byte])(_ ++ _) ++ frames ++
            (if (v1) trailer else Array.empty[Byte])
        val s0 = Mp3Kernels.framesSig(frames)
        val s1 = Mp3Kernels.framesSig(wrap(pre1, v1a))
        val s2 = Mp3Kernels.framesSig(wrap(pre2, v1b))
        s0 != null && s0 == s1 && s1 == s2 &&
          s0.getLong(2) == frames.length.toLong
    })
  }

  test("meta: version/layer/rate/frames, tag-wrap invariant, VBR walked per frame") {
    val m0 = Mp3Kernels.mp3Meta(Mp3Fixtures.syntheticMp3(3L, 0))
    val m1 = Mp3Kernels.mp3Meta(Mp3Fixtures.syntheticMp3(3L, 1))
    assert(m0 == m1, "tags must not change any metadata field")
    assert(m0.getUTF8String(0).toString == "1" && m0.getInt(1) == 3)
    assert(m0.getInt(2) == 44100 && m0.getInt(3) == 5) // seed 3: srIdx 0, 3%5+2
    // a VBR stream (different bitrate per frame) walks frame-by-frame:
    // MPEG-1 Layer III 44.1k, 128k (417 B) then 192k (626 B)
    def frame(brIdx: Int, len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = ((brIdx << 4) | (0 << 2)).toByte; f(3) = 0x44
      f
    }
    val vbr = frame(9, 417) ++ frame(11, 626)
    val mv = Mp3Kernels.mp3Meta(vbr)
    assert(mv != null && mv.getInt(3) == 2)
    assert(Mp3Kernels.framesSig(vbr).getLong(2) == 1043L)
    // free-format bitrate (index 0) is out of scope → null, never a guess
    assert(Mp3Kernels.mp3Meta(frame(0, 417)) == null)
    // reserved version bits / layer bits → null
    val badVer = frame(9, 417); badVer(1) = 0xeb.toByte // version bits 01
    assert(Mp3Kernels.mp3Meta(badVer) == null)
    // MPEG-2 Layer III: half rate table, 72-factor frame size
    // (24 kHz, 64 kbps → 192 B), version string "2"
    val v2 = new Array[Byte](192)
    v2(0) = 0xff.toByte; v2(1) = 0xf3.toByte // MPEG-2, Layer III
    v2(2) = ((8 << 4) | (1 << 2)).toByte // brIdx 8 = 64k, srIdx 1 = 24000
    val m2 = Mp3Kernels.mp3Meta(v2)
    assert(m2 != null && m2.getUTF8String(0).toString == "2" &&
      m2.getInt(2) == 24000 && m2.getInt(3) == 1)
  }

  test("cross-batch: byte copies AND re-tags drop, re-encodes/fresh survive, replay suppressive") {
    val dir = tmpDir() + "/cat"
    val _ = Mp3Dedup.applyBatch(
      tracks((0L, Mp3Fixtures.syntheticMp3(10L, 0)),
        (1L, Mp3Fixtures.syntheticMp3(11L, 0))),
      dir, "id", "mp3", added = 0L)
    val batch = tracks(
      (100L, Mp3Fixtures.syntheticMp3(10L, 0)), // byte copy → drops
      (101L, Mp3Fixtures.syntheticMp3(11L, 1)), // re-tag → drops
      (102L, Mp3Fixtures.syntheticMp3(12L, 0)), // fresh stream → survives
      // "re-encode": same lineage, different frame bytes
      (103L, Mp3Fixtures.syntheticMp3(10L ^ 0x7f7f7fL, 0)))
    var delivered: Set[Long] = null
    val out = Mp3Dedup.applyBatch(batch, dir, "id", "mp3", added = 1L,
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(102L, 103L))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay: survivors are now catalog members
    assert(Mp3Dedup.applyBatch(batch, dir, "id", "mp3", added = 2L)
      .count() == 0)
  }

  test("in-batch collapse keeps min id; non-MP3 payloads pass and never enter the catalog") {
    val dir = tmpDir() + "/inb"
    val batch = tracks(
      (200L, Mp3Fixtures.syntheticMp3(20L, 0)),
      (201L, Mp3Fixtures.syntheticMp3(20L, 1)), // in-batch re-tag of 200
      (202L, Mp3Fixtures.syntheticMp3(21L, 0)))
      .unionByName(Seq((9L, "not audio".getBytes)).toDF("id", "mp3"))
    val out = Mp3Dedup.applyBatch(batch, dir, "id", "mp3")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      Set(9L, 200L, 202L))
    // the junk payload is not catalog state: replaying it passes again
    assert(Mp3Dedup.applyBatch(
      Seq((10L, "not audio".getBytes)).toDF("id", "mp3"),
      dir, "id", "mp3", added = 1L).count() == 1)
  }

  test("kind universe guard; streaming wrapper hygiene; versioned root carries the seen-set") {
    val dir = tmpDir() + "/kind"
    val _ = Mp3Dedup.applyBatch(
      tracks((0L, Mp3Fixtures.syntheticMp3(30L, 0))), dir, "id", "mp3")
    val e = intercept[IllegalArgumentException] {
      ExactCatalog.read(spark, dir)
    }
    assert(e.getMessage.contains(Mp3Dedup.Kind))
    // streaming wrapper: per-bucket hygiene compacts replayed appends
    val sdir = tmpDir() + "/stream"
    val _2 = graft.streaming.StreamingMp3Dedup.applyBatch(
      tracks((0L, Mp3Fixtures.syntheticMp3(40L, 0)),
        (1L, Mp3Fixtures.syntheticMp3(41L, 0))),
      sdir, "id", "mp3", compactAboveFiles = 1, added = 1L)
    val out2 = graft.streaming.StreamingMp3Dedup.applyBatch(
      tracks((100L, Mp3Fixtures.syntheticMp3(40L, 1)), // re-tag of 0
        (101L, Mp3Fixtures.syntheticMp3(42L, 0))),
      sdir, "id", "mp3", compactAboveFiles = 1, added = 2L)
    assert(out2.select("id").collect().map(_.getLong(0)).toSet == Set(101L))
    // versioned root: bootstrap, then a tripped rebucket mid-stream
    val root = tmpDir() + "/vroot"
    val s1 = graft.streaming.StreamingMp3Dedup.applyBatchVersioned(
      tracks((0L, Mp3Fixtures.syntheticMp3(50L, 0)),
        (1L, Mp3Fixtures.syntheticMp3(51L, 0))),
      root, "id", "mp3", numBuckets = 4, added = 1L)
    assert(s1.count() == 2)
    val s2 = graft.streaming.StreamingMp3Dedup.applyBatchVersioned(
      tracks((100L, Mp3Fixtures.syntheticMp3(50L, 1))), root, "id", "mp3",
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(s2.count() == 0, "re-tag of a v1 survivor must drop across the cutover")
    assert(graft.streaming.StreamingMp3Dedup.applyBatchVersioned(
      tracks((200L, Mp3Fixtures.syntheticMp3(51L, 1))), root, "id", "mp3",
      added = 3L).count() == 0)
  }
}
