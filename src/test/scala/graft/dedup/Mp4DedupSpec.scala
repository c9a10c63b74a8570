package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{Mp4Fixtures, Mp4Kernels}

class Mp4DedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mp4-spec").toString

  private def vids(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("id", "mp4")

  test("mdat signature: re-mux invariant, payload-sensitive, null off the format") {
    val a0 = Mp4Fixtures.syntheticMp4(1L, 0)
    val a1 = Mp4Fixtures.syntheticMp4(1L, 1) // re-mux of a0
    val b0 = Mp4Fixtures.syntheticMp4(2L, 0)
    assert(!java.util.Arrays.equals(a0, a1),
      "the re-mux must differ bytewise or the tier proves nothing")
    val sa0 = Mp4Kernels.mdatSig(a0)
    val sa1 = Mp4Kernels.mdatSig(a1)
    val sb0 = Mp4Kernels.mdatSig(b0)
    assert(sa0 == sa1, "same mdat payload must sign identically across muxes")
    assert(sa0 != sb0, "different payloads must sign differently")
    // ... while the METADATA view distinguishes the muxes (different
    // brand/timescale), pinning that the two kernels read different
    // strata of the same container
    assert(Mp4Kernels.mp4Meta(a0) != Mp4Kernels.mp4Meta(a1))
    // non-BMFF, truncated, and header-only (no mdat) payloads are null
    assert(Mp4Kernels.mdatSig("junk".getBytes) == null)
    assert(Mp4Kernels.mdatSig(java.util.Arrays.copyOf(a0, 12)) == null)
    val headerOnly = java.util.Arrays.copyOf(a0, a0.length - 256 - 8)
    assert(Mp4Kernels.mdatSig(headerOnly) == null)
  }

  test("mdat signature: re-mux invariance under RANDOM box layouts (property)") {
    import org.scalacheck.{Gen, Prop}
    // a generic re-muxer: same mdat payload, randomized metadata boxes
    // (free/skip/udta with random sizes), randomized placement of mdat
    // among them, random brand — everything a real remux tool touches
    def box(tag: String, body: Array[Byte]): Array[Byte] = {
      val size = 8 + body.length
      Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        tag.getBytes("US-ASCII") ++ body
    }
    val junkBox: Gen[Array[Byte]] = for {
      tag <- Gen.oneOf("free", "skip", "udta")
      n <- Gen.choose(0, 40)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield box(tag, bytes.toArray)
    val gen = for {
      payloadLen <- Gen.choose(1, 512)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      brand <- Gen.oneOf("isom", "mp42", "qt  ")
      pre <- Gen.listOf(junkBox).map(_.take(3))
      post <- Gen.listOf(junkBox).map(_.take(3))
    } yield (payloadLen, seed, brand, pre, post)
    graft.PropCheck.check(Prop.forAll(gen) {
      case (payloadLen, seed, brand, pre, post) =>
        val payload = new Array[Byte](payloadLen)
        var x = seed
        var i = 0
        while (i < payloadLen) {
          x = x * 6364136223846793005L + 1442695040888963407L
          payload(i) = (x >>> 33).toByte; i += 1
        }
        val ftyp = box("ftyp", (brand + "    ").getBytes("US-ASCII"))
        val mdat = box("mdat", payload)
        val mux1 = ftyp ++ pre.foldLeft(Array.empty[Byte])(_ ++ _) ++ mdat ++
          post.foldLeft(Array.empty[Byte])(_ ++ _)
        val mux2 = ftyp ++ post.foldLeft(Array.empty[Byte])(_ ++ _) ++
          pre.foldLeft(Array.empty[Byte])(_ ++ _) ++ mdat
        val s1 = Mp4Kernels.mdatSig(mux1)
        val s2 = Mp4Kernels.mdatSig(mux2)
        // invariant across muxes; sensitive to a single flipped payload byte
        val flipped = mdat.clone()
        flipped(8 + payloadLen / 2) = (flipped(8 + payloadLen / 2) ^ 1).toByte
        val s3 = Mp4Kernels.mdatSig(ftyp ++ flipped)
        s1 != null && s1 == s2 && s1 != s3 &&
          s1.getLong(2) == payloadLen.toLong
    })
  }

  test("mdat signature: split mdat boxes hash as the CONCATENATED payload") {
    // a fragmented container (two mdat boxes) must sign like the single-
    // mdat container carrying the same total payload — the class doc's
    // concatenation contract
    def box(tag: String, body: Array[Byte]): Array[Byte] = {
      val size = 8 + body.length
      Array[Byte](((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        tag.getBytes("US-ASCII") ++ body
    }
    val payload = (0 until 100).map(_.toByte).toArray
    val ftyp = box("ftyp", "isom    ".getBytes("US-ASCII"))
    val whole = ftyp ++ box("mdat", payload)
    val split = ftyp ++ box("mdat", payload.take(37)) ++
      box("free", new Array[Byte](5)) ++ box("mdat", payload.drop(37))
    assert(Mp4Kernels.mdatSig(whole) == Mp4Kernels.mdatSig(split))
  }

  test("cross-batch: byte copies AND re-muxes drop, re-encodes/fresh survive, replay suppressive") {
    val dir = tmpDir() + "/cat"
    val _ = Mp4Dedup.applyBatch(
      vids((0L, Mp4Fixtures.syntheticMp4(10L, 0)),
        (1L, Mp4Fixtures.syntheticMp4(11L, 0))),
      dir, "id", "mp4", added = 0L)
    val batch = vids(
      (100L, Mp4Fixtures.syntheticMp4(10L, 0)), // byte copy → drops
      (101L, Mp4Fixtures.syntheticMp4(11L, 1)), // re-mux → drops
      (102L, Mp4Fixtures.syntheticMp4(12L, 0)), // fresh payload → survives
      // "re-encode": same seed lineage but different payload bytes
      (103L, Mp4Fixtures.syntheticMp4(10L, 0, payloadBytes = 300)))
    var delivered: Set[Long] = null
    val out = Mp4Dedup.applyBatch(batch, dir, "id", "mp4", added = 1L,
      deliver = d => delivered = d.select("id").collect().map(_.getLong(0)).toSet)
    assert(delivered == Set(102L, 103L))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == delivered)
    // replay: survivors are now catalog members
    assert(Mp4Dedup.applyBatch(batch, dir, "id", "mp4", added = 2L)
      .count() == 0)
  }

  test("in-batch collapse keeps min id; non-BMFF payloads pass and never enter the catalog") {
    val dir = tmpDir() + "/inb"
    val batch = vids(
      (200L, Mp4Fixtures.syntheticMp4(20L, 0)),
      (201L, Mp4Fixtures.syntheticMp4(20L, 1)), // in-batch re-mux of 200
      (202L, Mp4Fixtures.syntheticMp4(21L, 0)))
      .unionByName(Seq((9L, "not a video".getBytes)).toDF("id", "mp4"))
    val out = Mp4Dedup.applyBatch(batch, dir, "id", "mp4")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      Set(9L, 200L, 202L))
    // the junk payload is not catalog state: replaying it passes again
    assert(Mp4Dedup.applyBatch(
      Seq((10L, "not a video".getBytes)).toDF("id", "mp4"),
      dir, "id", "mp4", added = 1L).count() == 1)
  }

  test("kind universe guard; streaming wrapper hygiene; versioned root carries the seen-set") {
    val dir = tmpDir() + "/kind"
    val _ = Mp4Dedup.applyBatch(
      vids((0L, Mp4Fixtures.syntheticMp4(30L, 0))), dir, "id", "mp4")
    val e = intercept[IllegalArgumentException] {
      ExactCatalog.read(spark, dir)
    }
    assert(e.getMessage.contains(Mp4Dedup.Kind))
    // streaming wrapper: per-bucket hygiene compacts replayed appends
    val sdir = tmpDir() + "/stream"
    val _2 = graft.streaming.StreamingMp4Dedup.applyBatch(
      vids((0L, Mp4Fixtures.syntheticMp4(40L, 0)),
        (1L, Mp4Fixtures.syntheticMp4(41L, 0))),
      sdir, "id", "mp4", compactAboveFiles = 1, added = 1L)
    val out2 = graft.streaming.StreamingMp4Dedup.applyBatch(
      vids((100L, Mp4Fixtures.syntheticMp4(40L, 1)), // re-mux of 0
        (101L, Mp4Fixtures.syntheticMp4(42L, 0))),
      sdir, "id", "mp4", compactAboveFiles = 1, added = 2L)
    assert(out2.select("id").collect().map(_.getLong(0)).toSet == Set(101L))
    // versioned root: bootstrap, then a tripped rebucket mid-stream
    val root = tmpDir() + "/vroot"
    val s1 = graft.streaming.StreamingMp4Dedup.applyBatchVersioned(
      vids((0L, Mp4Fixtures.syntheticMp4(50L, 0)),
        (1L, Mp4Fixtures.syntheticMp4(51L, 0))),
      root, "id", "mp4", numBuckets = 4, added = 1L)
    assert(s1.count() == 2)
    val s2 = graft.streaming.StreamingMp4Dedup.applyBatchVersioned(
      vids((100L, Mp4Fixtures.syntheticMp4(50L, 1))), root, "id", "mp4",
      added = 2L, maintainEvery = 2L,
      policy = graft.ops.GrowthPolicy.Policy(
        targetBucketBytes = 1L, maxFilesPerBucket = 64))
    assert(s2.count() == 0, "re-mux of a v1 survivor must drop across the cutover")
    assert(graft.streaming.StreamingMp4Dedup.applyBatchVersioned(
      vids((200L, Mp4Fixtures.syntheticMp4(51L, 1))), root, "id", "mp4",
      added = 3L).count() == 0)
  }
}
