package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.functions.{OggFixtures, OggKernels}

class OggDedupSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ogg-spec").toString

  private def tracks(rows: (Long, Array[Byte])*): DataFrame =
    rows.toDF("id", "ogg")

  test("packet signature: re-tag invariant (both codecs), payload/boundary-sensitive, null off the format") {
    for (seed <- Seq(2L /* vorbis */, 3L /* opus */)) {
      val a0 = OggFixtures.syntheticOgg(seed, 0)
      val a1 = OggFixtures.syntheticOgg(seed, 1) // re-tag, repaged, renumbered
      assert(!java.util.Arrays.equals(a0, a1))
      val s0 = OggKernels.packetsSig(a0)
      assert(s0 != null && s0 == OggKernels.packetsSig(a1),
        s"seed $seed: same audio packets must sign identically across tags/paging")
      assert(s0 != OggKernels.packetsSig(OggFixtures.syntheticOgg(seed + 2, 0)))
    }
    // PACKET BOUNDARIES are part of the signature: the same bytes as
    // one packet vs split into two must not collide
    val audioA = Array.tabulate[Byte](100)(_.toByte)
    val id = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      new Array[Byte](4) ++ Array[Byte](2) ++
      Array[Byte](0x44, 0xac.toByte, 0, 0) ++ new Array[Byte](13)
    val cm = Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
    val st = Array[Byte](5) ++ "vorbis".getBytes("US-ASCII")
    def ogg(audio: Seq[Array[Byte]]) =
      OggFixtures.buildPages(Seq(id, cm, st) ++ audio, 7L, 50, 0L)
    val whole = OggKernels.packetsSig(ogg(Seq(audioA)))
    val split = OggKernels.packetsSig(ogg(Seq(audioA.take(40), audioA.drop(40))))
    assert(whole != null && split != null && whole != split,
      "same bytes under different packet boundaries are different audio")
    // a packet spanning pages (lacing 255 across a page break) signs
    // identically to the same packet on one page
    val big = Array.tabulate[Byte](600)(i => (i * 7).toByte)
    val onePage = OggKernels.packetsSig(
      OggFixtures.buildPages(Seq(id, cm, st, big), 7L, 50, 0L))
    val tinyPages = OggKernels.packetsSig(
      OggFixtures.buildPages(Seq(id, cm, st, big), 7L, 1, 0L))
    assert(onePage != null && onePage == tinyPages)
    // off-format / malformed / multiplexed / header-only → null
    assert(OggKernels.packetsSig("not audio".getBytes) == null)
    assert(OggKernels.packetsSig(
      java.util.Arrays.copyOf(OggFixtures.syntheticOgg(2L, 0), 40)) == null)
    assert(OggKernels.packetsSig(
      OggFixtures.buildPages(Seq(id, cm, st), 7L, 50, 0L)) == null,
      "header-only stream carries no audio")
    // unknown codec (junk first packet) → null
    assert(OggKernels.packetsSig(
      OggFixtures.buildPages(Seq("whatish".getBytes, audioA), 7L, 50, 0L))
      == null)
    // two interleaved serials (grouped streams) are out of scope
    val s1 = OggFixtures.syntheticOgg(2L, 0)
    val s2 = OggFixtures.syntheticOgg(4L, 0)
    assert(OggKernels.packetsSig(s1 ++ s2) == null)
  }

  test("packet signature: invariance under RANDOM paging and tags (property)") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
      segs1 <- Gen.choose(1, 60)
      segs2 <- Gen.choose(1, 60)
      vendor1 <- Gen.alphaNumStr.map(_.take(30))
      vendor2 <- Gen.alphaNumStr.map(_.take(30))
      seq1 <- Gen.choose(0L, 1000L)
      seq2 <- Gen.choose(0L, 1000L)
    } yield (seed, segs1, segs2, vendor1, vendor2, seq1, seq2)
    graft.PropCheck.check(Prop.forAll(gen) {
      case (seed, segs1, segs2, vendor1, vendor2, seq1, seq2) =>
        val vorbis = math.floorMod(seed, 2L) == 0L
        val id: Array[Byte] =
          if (vorbis) Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
            new Array[Byte](4) ++ Array[Byte](1) ++
            Array[Byte](0x44, 0xac.toByte, 0, 0) ++ new Array[Byte](13)
          else "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, 1) ++
            new Array[Byte](2) ++ Array[Byte](0x44, 0xac.toByte, 0, 0) ++
            new Array[Byte](3)
        def comment(vendor: String): Array[Byte] = {
          val v = vendor.getBytes("US-ASCII")
          (if (vorbis) Array[Byte](3) ++ "vorbis".getBytes("US-ASCII")
           else "OpusTags".getBytes("US-ASCII")) ++
            Array[Byte]((v.length & 0xff).toByte, 0, 0, 0) ++ v ++
            Array[Byte](0, 0, 0, 0)
        }
        val setup = if (vorbis)
          Seq(Array[Byte](5) ++ "vorbis".getBytes("US-ASCII")) else Seq.empty
        var x = seed
        val audio = (0 until 3).map { j =>
          val len = math.floorMod(seed + j, 700L).toInt + 1
          val pkt = new Array[Byte](len)
          var k = 0
          while (k < len) {
            x = x * 6364136223846793005L + 1442695040888963407L
            pkt(k) = (x >>> 33).toByte; k += 1
          }
          pkt
        }
        val f1 = OggFixtures.buildPages(
          Seq(id, comment(vendor1)) ++ setup ++ audio, 42L, segs1, seq1)
        val f2 = OggFixtures.buildPages(
          Seq(id, comment(vendor2)) ++ setup ++ audio, 42L, segs2, seq2)
        val sig1 = OggKernels.packetsSig(f1)
        val sig2 = OggKernels.packetsSig(f2)
        sig1 != null && sig1 == sig2 &&
          sig1.getLong(2) == audio.map(_.length.toLong).sum
    })
  }

  test("meta: codec/channels/rate/packets for both codecs, re-tag invariant") {
    val v0 = OggKernels.oggMeta(OggFixtures.syntheticOgg(6L, 0))
    val v1 = OggKernels.oggMeta(OggFixtures.syntheticOgg(6L, 1))
    assert(v0 == v1, "re-tag must not change any metadata field")
    // seed 6: vorbis, rate idx 0 → 44100, channels 1, audio 6%4+2 = 4
    assert(v0.getUTF8String(0).toString == "vorbis" && v0.getInt(1) == 1 &&
      v0.getInt(2) == 44100 && v0.getInt(3) == 4)
    val o = OggKernels.oggMeta(OggFixtures.syntheticOgg(7L, 0))
    // seed 7: opus, rate idx 1 → 48000, channels 2, audio 7%4+2 = 5
    assert(o.getUTF8String(0).toString == "opus" && o.getInt(1) == 2 &&
      o.getInt(2) == 48000 && o.getInt(3) == 5)
    assert(OggKernels.oggMeta("junk".getBytes) == null)
  }

  test("meta: id header shorter than its fields refuses instead of reading the next packet") {
    def vorbisTail(n: Int): Array[Byte] = new Array[Byte](n)
    val comment = Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++
      vorbisTail(8)
    val setup = Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++
      vorbisTail(20)
    val audio = Array.fill[Byte](50)(7)
    // packet 0 = the bare 7-byte \x01vorbis magic: enough to pass the
    // codec sniff, but carrying no channel/rate fields — before the
    // lacing-derived length guard, oggMeta read those from the COMMENT
    // packet's bytes and returned garbage
    val bare = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII")
    val f1 = OggFixtures.buildPages(Seq(bare, comment, setup, audio), 9L, 10, 0L)
    assert(OggKernels.packetsSig(f1) != null,
      "framing itself is valid — the sniff alone must pass packetsSig")
    assert(OggKernels.oggMeta(f1) == null)
    // 29-byte Vorbis id (one short of the 30-byte spec minimum) with
    // PLAUSIBLE channel/rate fields: only the length guard catches it
    val short = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      new Array[Byte](4) ++ Array[Byte](2) ++
      Array[Byte](0x44, 0xac.toByte, 0, 0) ++ new Array[Byte](13)
    assert(short.length == 29)
    val f2 = OggFixtures.buildPages(Seq(short, comment, setup, audio), 9L, 10, 0L)
    assert(OggKernels.oggMeta(f2) == null)
    // 18-byte OpusHead (one short of the 19-byte spec minimum), same shape
    val shortOpus = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1, 2) ++ new Array[Byte](2) ++
      Array[Byte](0x80.toByte, 0xbb.toByte, 0, 0) ++ new Array[Byte](2)
    assert(shortOpus.length == 18)
    val f3 = OggFixtures.buildPages(
      Seq(shortOpus, "OpusTags".getBytes("US-ASCII") ++ vorbisTail(8), audio),
      9L, 10, 0L)
    assert(OggKernels.oggMeta(f3) == null)
  }

  test("tier: cross-batch drops, in-batch collapse, kind guard through the SigDedup binding") {
    val dir = tmpDir() + "/cat"
    val _ = OggDedup.applyBatch(
      tracks((0L, OggFixtures.syntheticOgg(10L, 0)),
        (1L, OggFixtures.syntheticOgg(11L, 0))),
      dir, "id", "ogg", added = 0L)
    val batch = tracks(
      (100L, OggFixtures.syntheticOgg(10L, 0)), // byte copy → drops
      (101L, OggFixtures.syntheticOgg(11L, 1)), // re-tag → drops
      (102L, OggFixtures.syntheticOgg(12L, 0)), // fresh → survives
      (103L, OggFixtures.syntheticOgg(12L, 1))) // in-batch re-tag of 102
      .unionByName(Seq((9L, "junk".getBytes)).toDF("id", "ogg"))
    val out = graft.streaming.StreamingOggDedup.applyBatch(
      batch, dir, "id", "ogg", added = 1L)
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(9L, 102L))
    // replay: survivors are now catalog members; junk never is
    assert(graft.streaming.StreamingOggDedup.applyBatch(
      batch, dir, "id", "ogg", added = 2L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(9L))
    val e = intercept[IllegalArgumentException] { ExactCatalog.read(spark, dir) }
    assert(e.getMessage.contains(OggDedup.Kind))
  }
}
