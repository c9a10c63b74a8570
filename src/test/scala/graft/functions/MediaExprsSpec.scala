package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestBase

class MediaExprsSpec extends AnyFunSuite with SparkTestBase {

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dims(b: Array[Byte]): Option[(Int, Int)] =
    Option(MediaKernels.imageDims(b)).map(r => (r.getInt(0), r.getInt(1)))

  test("PNG: width/height from IHDR (BE32 at 16/20)") {
    val png = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 0806000000")
    assert(dims(png).contains((640, 480)))
  }

  test("GIF: logical screen descriptor (LE16 at 6/8)") {
    val gif = hexBytes("474946383961 8002 E001 F70000")
    assert(dims(gif).contains((640, 480)))
    val gif87 = hexBytes("474946383761 0A00 1400 00")
    assert(dims(gif87).contains((10, 20)))
  }

  test("JPEG: walks APP/quantization segments to SOF0/SOF2") {
    // FFD8, APP0 (16 bytes), DQT (5-byte dummy), SOF0 h=480 w=640
    val jpg = hexBytes(
      "FFD8 FFE0 0010 4A46494600010100000100010000" +
      "FFDB 0005 010203" +
      "FFC0 0011 08 01E0 0280 03 012200 021101 031101 FFD9")
    assert(dims(jpg).contains((640, 480)))
    // progressive (SOF2) found the same way
    val prog = hexBytes("FFD8 FFC2 0011 08 0064 00C8 03 012200 021101 031101")
    assert(dims(prog).contains((200, 100)))
    // DHT (C4) is NOT a SOF marker and must be skipped, not parsed
    val dht = hexBytes("FFD8 FFC4 0004 0000 FFC0 0011 08 0002 0003 03 012200 021101 031101")
    assert(dims(dht).contains((3, 2)))
  }

  test("BMP: LE32 at 18/22, negative (top-down) height → |height|") {
    def bmp(widthLE: String, heightLE: String) = hexBytes(
      "424D 00000000 0000 0000 36000000 28000000 " + widthLE + heightLE)
    assert(dims(bmp("80020000", "E0010000")).contains((640, 480)))
    assert(dims(bmp("80020000", "20FEFFFF")).contains((640, 480))) // -480
  }

  test("WebP: VP8X canvas LE24, VP8L packed 14-bit, VP8 lossy keyframe") {
    // VP8X: canvas 640x480 → (w-1, h-1) LE24 after 4 flag/reserved bytes
    val vp8x = hexBytes(
      "52494646 16000000 57454250 56503858 0A000000 00000000 7F0200 DF0100")
    assert(dims(vp8x).contains((640, 480)))
    // VP8L: signature 0x2F, then bits = (w-1) | (h-1)<<14 LSB-first;
    // 640x480: 639 | 479<<14 = 0x77C27F → LE bytes 7F C2 77 00
    val vp8l = hexBytes(
      "52494646 11000000 57454250 5650384C 05000000 2F 7FC27700 00")
    assert(dims(vp8l).contains((640, 480)))
    // VP8 lossy: 3-byte frame tag, start code 9D 01 2A, then LE16 w/h
    val vp8 = hexBytes(
      "52494646 16000000 57454250 56503820 0A000000 000000 9D012A 8002 E001")
    assert(dims(vp8).contains((640, 480)))
    // non-WebP RIFF (WAVE) is not an image; truncated/malformed → null
    assert(dims(hexBytes("52494646 24000000 57415645 666D7420")).isEmpty)
    assert(dims(java.util.Arrays.copyOf(vp8x, 20)).isEmpty)
    val badSig = vp8l.clone(); badSig(20) = 0x30
    assert(dims(badSig).isEmpty)
    val badStart = vp8.clone(); badStart(23) = 0x00
    assert(dims(badStart).isEmpty)
  }

  test("garbage, truncation and non-images return null, never throw") {
    assert(dims(Array.emptyByteArray).isEmpty)
    assert(dims("plain text".getBytes).isEmpty)
    assert(dims(hexBytes("89504E470D0A1A0A0000")).isEmpty) // truncated PNG
    assert(dims(hexBytes("FFD8FFE0")).isEmpty)             // truncated JPEG
    assert(dims(hexBytes("FFD800FF")).isEmpty)             // lost sync
  }

  test("column expression: codegen path agrees with the kernel and nulls propagate") {
    import spark.implicits._
    val png = hexBytes("89504E470D0A1A0A0000000D49484452000000050000000A0806000000")
    val rows = Seq(
      (1L, png), (2L, "nope".getBytes), (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
      .select(col("id"), GraftFunctions.imageDims(col("payload")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row(5, 10))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    // and through SQL registration
    GraftFunctions.register(spark)
    Seq(png).toDF("p").createOrReplaceTempView("imgs")
    val viaSql = spark.sql("SELECT image_dims(p) AS d FROM imgs").collect()
    assert(viaSql.head.getStruct(0) == Row(5, 10))
  }

  // ------------------------------------------------------------- WAV

  private def wav(b: Array[Byte]): Option[(Int, Int, Int, Long)] =
    Option(WavKernels.wavMeta(b)).map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  /** 44-byte canonical PCM header: stereo, 16 kHz, 16-bit, 8 data bytes. */
  private val canonicalWav = hexBytes(
    "52494646 2C000000 57415645" +          // RIFF size=44-8+8 WAVE
    "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000" +
    "64617461 08000000")

  test("WAV: fmt + data fields from the canonical header layout") {
    assert(wav(canonicalWav).contains((2, 16000, 16, 8L)))
  }

  test("WAV: chunk walk skips unknown chunks (LIST before fmt), pads odd sizes") {
    // LIST chunk of ODD size 3 (padded to 4), then fmt, then data
    val listFirst = hexBytes(
      "52494646 37000000 57415645" +
      "4C495354 03000000 414243 00" +        // LIST, 3 bytes + pad
      "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      "64617461 05000000")
    assert(wav(listFirst).contains((1, 8000, 8, 5L)))
  }

  test("WAV: non-RIFF, truncated, and zero-field headers return null") {
    assert(wav("RIFFxxxx".getBytes).isEmpty)          // no WAVE tag
    assert(wav(hexBytes("52494646 04000000 57415645")).isEmpty) // no chunks
    assert(wav(canonicalWav.take(20)).isEmpty)        // truncated fmt
    val zeroRate = canonicalWav.clone
    zeroRate(24) = 0; zeroRate(25) = 0; zeroRate(26) = 0; zeroRate(27) = 0
    assert(wav(zeroRate).isEmpty)
  }

  test("WAV: huge/overflowing declared chunk sizes terminate (no hang, no throw)") {
    // chunk size 0xFFFFFFF8: as a truncated Int this is -8, which would
    // stall the cursor forever; as unsigned it overshoots the buffer and
    // the walk must just end
    val hugeChunk = hexBytes(
      "52494646 2C000000 57415645" +
      "4C495354 F8FFFFFF" + "00" * 8)
    assert(wav(hugeChunk).isEmpty)
    // size 0xFFFFFF00 similarly must not index negatively
    val negCursor = hexBytes(
      "52494646 2C000000 57415645" +
      "4C495354 00FFFFFF" + "00" * 8)
    assert(wav(negCursor).isEmpty)
    // a valid fmt BEFORE the bogus chunk still yields null (no data
    // chunk reachable) rather than an exception
    val fmtThenHuge = hexBytes(
      "52494646 2C000000 57415645" +
      "666D7420 10000000 0100 0200 803E0000 00FA0000 0400 1000" +
      "4C495354 FFFFFFFF")
    assert(wav(fmtThenHuge).isEmpty)
  }

  test("WAV column expression: codegen agrees with the kernel, nulls propagate") {
    import spark.implicits._
    val rows = Seq(
      (1L, canonicalWav), (2L, "not audio".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
      .select(col("id"), GraftFunctions.wavMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row(2, 16000, 16, 8L))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    GraftFunctions.register(spark)
    Seq(canonicalWav).toDF("p").createOrReplaceTempView("wavs")
    val viaSql = spark.sql("SELECT wav_meta(p) AS m FROM wavs").collect()
    assert(viaSql.head.getStruct(0) == Row(2, 16000, 16, 8L))
  }

  // ---- MP4 / ISO-BMFF -------------------------------------------------

  private def mp4(b: Array[Byte]): Option[(String, Int, Long, Int)] =
    Option(Mp4Kernels.mp4Meta(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2), r.getInt(3)))

  /** rate + volume + reserveds + unity matrix + predefined + next_track. */
  private def mvhdTail =
    "00010000" + "0100" + "0000" + "00" * 8 +
      "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000" +
      "00000000" * 6 + "00000002"

  /** ftyp(isom) + moov[mvhd v0 (timescale 600, duration 1200) + 2 trak]. */
  private def canonicalMp4 = hexBytes(
    "00000010 66747970 69736F6D 00000000" +
    "00000084 6D6F6F76" +
    "0000006C 6D766864 00000000 00000000 00000000 00000258 000004B0" +
    mvhdTail +
    "00000008 7472616B" + "00000008 7472616B")

  test("MP4: ftyp brand + mvhd v0 timescale/duration + trak count") {
    assert(mp4(canonicalMp4).contains(("isom", 600, 1200L, 2)))
  }

  test("MP4: version-1 mvhd reads the 64-bit duration") {
    // mvhd v1 (size 0x78): 8-byte creation/modification, ts 90000,
    // duration 2^32 + 5
    val v1 = hexBytes(
      "00000010 66747970 6D703432 00000000" +
      "00000080 6D6F6F76" +
      "00000078 6D766864 01000000" + "00" * 16 +
      "00015F90 0000000100000005" + mvhdTail)
    assert(mp4(v1).contains(("mp42", 90000, 4294967301L, 0)))
  }

  test("MP4: an mvhd declared via 64-bit largesize reads fields after the 16-byte header") {
    // mvhd with size==1 + largesize 0x74 (= 16 hdr + 100 payload):
    // version byte sits at j+16, v0 timescale at j+28, duration at j+32
    val large = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "0000007C 6D6F6F76" +
      "00000001 6D766864 0000000000000074" +
      "00000000 00000000 00000000 00000258 000004B0" + mvhdTail)
    assert(mp4(large).contains(("isom", 600, 1200L, 0)))
  }

  test("MP4: largesize (size==1) and size==0 (to end) boxes walk correctly") {
    // moov declared via 64-bit largesize
    val large = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000001 6D6F6F76 0000000000000084" +
      "0000006C 6D766864 00000000 00000000 00000000 00000258 000004B0" +
      mvhdTail + "00000008 7472616B")
    assert(mp4(large).contains(("isom", 600, 1200L, 1)))
    // a free box with size 0 (extends to EOF) after moov must not break
    val sizeZeroTail = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000074 6D6F6F76" +
      "0000006C 6D766864 00000000 00000000 00000000 00000258 000004B0" +
      mvhdTail +
      "00000000 66726565 AABB")
    assert(mp4(sizeZeroTail).contains(("isom", 600, 1200L, 0)))
  }

  test("MP4: a largesize declaring < 16 bytes is malformed (header alone is 16)") {
    // size==1 box whose 64-bit largesize (12) is smaller than its own
    // 16-byte header: `i += size` would land mid-header and misparse
    // header bytes as boxes — both kernels must refuse (null), not
    // emit an arbitrary meta/signature from the misparse
    val badFree =
      "00000001 66726565 000000000000000C"
    val meta = hexBytes(
      "00000010 66747970 69736F6D 00000000" + badFree +
      "00000074 6D6F6F76" +
      "0000006C 6D766864 00000000 00000000 00000000 00000258 000004B0" +
      mvhdTail)
    assert(mp4(meta).isEmpty)
    // same guard inside the moov child walk
    val childBad = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000084 6D6F6F76" + badFree +
      "0000006C 6D766864 00000000 00000000 00000000 00000258 000004B0" +
      mvhdTail + "00000008 7472616B")
    assert(mp4(childBad).isEmpty)
    // ... and in the mdat signature walk (an in-range [8,16) largesize
    // previously walked on and signed the misparse instead of refusing)
    val sigBad = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000001 6D646174 000000000000000C" +
      "00000010 6D646174 AABBCCDD EEFF0011")
    assert(Mp4Kernels.mdatSig(sigBad) == null)
  }

  test("MP4: non-BMFF, truncated and malformed sizes return null, never hang") {
    assert(mp4("not a video at all".getBytes).isEmpty)
    assert(mp4(canonicalMp4.take(30)).isEmpty)      // truncated moov
    assert(mp4(hexBytes("00000010 66747970 69736F6D 00000000")).isEmpty) // no moov
    // box size < 8 is malformed
    assert(mp4(hexBytes(
      "00000010 66747970 69736F6D 00000000 00000003 6D6F6F76")).isEmpty)
    // huge declared moov child size: cursor must terminate, not spin
    assert(mp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000020 6D6F6F76 FFFFFFF8 6D766864 0000000000000000")).isEmpty)
    // a 64-bit largesize near Long.MaxValue must not OVERFLOW the Long
    // cursor (i += size wrapping negative cycled forever before the
    // past-the-buffer clamp; u32 WAV sizes can't hit this, 64-bit can)
    assert(mp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000001 66726565 7FFFFFFFFFFFFFF0")).isEmpty)
    assert(mp4(hexBytes(      // same overflow inside the moov child walk
      "00000010 66747970 69736F6D 00000000" +
      "00000020 6D6F6F76 00000001 66726565 7FFFFFFFFFFFFFF0 00000000")).isEmpty)
    // u32 timescale past Int.MaxValue would wrap negative in the
    // non-nullable int field — malformed, like the WAV rate guard
    val hugeTs = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000074 6D6F6F76" +
      "0000006C 6D766864 00000000 00000000 00000000 80000000 000004B0" +
      mvhdTail)
    assert(mp4(hugeTs).isEmpty)
  }

  test("MP4: mvhd smaller than its declared fields returns null, not sibling bytes") {
    // mvhd declares size 8 (header only); the plausible timescale /
    // duration bytes that FOLLOW it belong to a sibling box and must
    // not be read as mvhd fields (reads are bounded by j + cs, not just
    // the moov end)
    val tiny = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000028 6D6F6F76" +
      "00000008 6D766864" +
      "00000000" + "00000000 00000000" + "00000258 000004B0")
    assert(mp4(tiny).isEmpty)
    // v0 mvhd truncated mid-fields: size 12 < the 28 bytes v0 reads
    // need; the timescale/duration land exactly where sibling bytes sit
    val shortV0 = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000024 6D6F6F76" +
      "0000000C 6D766864 00000000" +
      "00000000 00000000" + "00000258 000004B0")
    assert(mp4(shortV0).isEmpty)
    // v1 mvhd truncated: size 0x24 < the 40 bytes v1 reads need — the
    // 64-bit duration would straddle the box boundary into a sibling
    val shortV1 = hexBytes(
      "00000010 66747970 69736F6D 00000000" +
      "00000034 6D6F6F76" +
      "00000024 6D766864 01000000" + "00" * 16 + "00015F90 00000001" +
      "00000008 66726565")
    assert(mp4(shortV1).isEmpty)
  }

  test("MP4 property: synthesized containers with junk boxes round-trip (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    def be32h(v: Long) = f"$v%08X"
    def be64h(v: Long) = f"$v%016X"
    def junkBox(): String = { // unknown box the walk must SKIP verbatim
      val payload = rnd.nextInt(24)
      be32h(8 + payload) + "6A6E6B00" + "AB" * payload // 'jnk\0'
    }
    for (_ <- 1 to 200) {
      val brand = Seq("isom", "mp42", "avc1", "qt  ")(rnd.nextInt(4))
      val brandHex = brand.getBytes.map(b => f"$b%02X").mkString
      val timescale = 1L + rnd.nextInt(Int.MaxValue)
      val v1 = rnd.nextBoolean()
      val duration =
        if (v1) rnd.nextLong(1L << 40) else rnd.nextInt(Int.MaxValue).toLong
      val nTracks = rnd.nextInt(6)
      val mvhd =
        if (v1) "00000078 6D766864 01000000" + "00" * 16 +
          be32h(timescale) + be64h(duration) + mvhdTail
        else "0000006C 6D766864 00000000 00000000 00000000" +
          be32h(timescale) + be32h(duration) + mvhdTail
      // moov children: junk boxes interleaved among mvhd and traks
      val children = (Seq(mvhd) ++ Seq.fill(nTracks)("00000008 7472616B"))
        .flatMap(c => if (rnd.nextBoolean()) Seq(junkBox(), c) else Seq(c))
        .mkString
      val childBytes = children.replaceAll("\\s", "").length / 2
      val preMoov = if (rnd.nextBoolean()) junkBox() else ""
      val bytes = hexBytes(
        "00000010 66747970 " + brandHex + " 00000000" +
        preMoov + be32h(8 + childBytes) + "6D6F6F76" + children)
      assert(mp4(bytes).contains((brand, timescale.toInt, duration, nTracks)),
        s"brand=$brand ts=$timescale v1=$v1 dur=$duration tracks=$nTracks")
    }
  }

  test("MP4 column expression: codegen agrees with the kernel; SQL name registered") {
    import spark.implicits._
    val rows = Seq(
      (1L, canonicalMp4), (2L, "nope".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
      .select(col("id"), GraftFunctions.mp4Meta(col("payload")).as("m"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1) == Row("isom", 600, 1200L, 2))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    GraftFunctions.register(spark)
    Seq(canonicalMp4).toDF("p").createOrReplaceTempView("mp4s")
    assert(spark.sql("SELECT mp4_meta(p) AS m FROM mp4s").collect()
      .head.getStruct(0) == Row("isom", 600, 1200L, 2))
  }
}
