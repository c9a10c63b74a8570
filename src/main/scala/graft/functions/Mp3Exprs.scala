package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MPEG audio (MP3) byte-walk kernels — the COMPRESSED-audio analogue
  * of the ISO-BMFF `mdat` signature ([[Mp4Kernels.mdatSig]]): the
  * dominant crawled audio format is MP3, whose tag containers (ID3v1
  * appended, ID3v2 prepended) are rewritten by every tagger, media
  * library and re-hoster while the MPEG frame stream itself — the
  * actual audio — is untouched. Hashing only the frame bytes sees
  * through a RE-TAG exactly as mdatSig sees through a re-mux.
  *
  * The frame walk follows the published MPEG-1/2/2.5 audio frame
  * header layout (11-bit sync, version/layer bits, bitrate and
  * sample-rate indices, padding bit; frame length = 144·bitrate/rate
  * for Layer II and MPEG-1 Layer III, 72·bitrate/rate for MPEG-2/2.5
  * Layer III, (12·bitrate/rate)·4 for Layer I — integer division,
  * padding added before the Layer I ×4). Honest scope, stated plainly:
  *  - free-format bitrate (index 0) is unsupported (frame length is
  *    not derivable from the header) → null;
  *  - APEv2 / Lyrics3 trailers and mid-stream garbage are not
  *    resynced → null (a corrupt crawl file passes through the dedup
  *    tier unharmed — a quality-filter concern, not a duplicate);
  *  - a RE-ENCODE produces new frame bytes and correctly does NOT
  *    match, same contract as the MP4 tier.
  */
object Mp3Kernels {

  /** Bitrate table, kbps: rows V1L1, V1L2, V1L3, V2L1, V2L2+L3
    * (MPEG-2.5 shares the MPEG-2 rows); index 0 = free (unsupported),
    * 15 = invalid. */
  private val Br: Array[Array[Int]] = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  /** MPEG-1 sample rates by index; MPEG-2 halves them, MPEG-2.5
    * quarters them. Index 3 is reserved. */
  private val Sr1 = Array(44100, 48000, 32000)

  /** Total byte length of an ID3v2 tag starting at `i` (header +
    * syncsafe size + optional footer), 0 if no tag starts there, -1 if
    * a tag starts but is malformed (non-syncsafe size byte / truncated
    * header). */
  private def id3v2Len(b: Array[Byte], i: Int): Int = {
    if (i + 3 > b.length ||
      !(b(i) == 'I' && b(i + 1) == 'D' && b(i + 2) == '3')) return 0
    if (i + 10 > b.length) return -1
    val flags = b(i + 5) & 0xff
    var sz = 0
    var k = 0
    while (k < 4) {
      val x = b(i + 6 + k) & 0xff
      if (x >= 0x80) return -1 // syncsafe bytes have the top bit clear
      sz = (sz << 7) | x
      k += 1
    }
    10 + sz + (if ((flags & 0x10) != 0) 10 else 0)
  }

  /** Byte length of the MPEG audio frame whose 4-byte header starts at
    * `i`, or -1 when the bytes are not a valid supported frame header. */
  private def frameLen(b: Array[Byte], i: Int): Int = {
    if (i + 4 > b.length) return -1
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return -1
    val vb = (b(i + 1) >> 3) & 3 // 0 = MPEG-2.5, 1 = reserved, 2 = MPEG-2, 3 = MPEG-1
    val lb = (b(i + 1) >> 1) & 3 // 0 = reserved, 1 = Layer III, 2 = II, 3 = I
    if (vb == 1 || lb == 0) return -1
    val br = (b(i + 2) >> 4) & 0xf
    val sr = (b(i + 2) >> 2) & 3
    val pad = (b(i + 2) >> 1) & 1
    if (br == 0 || br == 15 || sr == 3) return -1
    val v1 = vb == 3
    val table =
      if (v1) { if (lb == 3) 0 else if (lb == 2) 1 else 2 }
      else { if (lb == 3) 3 else 4 }
    val bitrate = Br(table)(br) * 1000
    val rate =
      if (vb == 3) Sr1(sr) else if (vb == 2) Sr1(sr) / 2 else Sr1(sr) / 4
    val len =
      if (lb == 3) (12 * bitrate / rate + pad) * 4
      else if (lb == 2 || v1) 144 * bitrate / rate + pad
      else 72 * bitrate / rate + pad
    if (len < 4) -1 else len
  }

  /** Position of the first MPEG frame (past any stacked leading ID3v2
    * tags), or -1 for malformed/oversized tag headers. */
  private def skipLeadingTags(b: Array[Byte]): Int = {
    var i = 0
    var t = id3v2Len(b, i)
    while (t > 0) {
      if (t > b.length - i) return -1 // tag claims more bytes than exist
      i += t
      t = id3v2Len(b, i)
    }
    if (t < 0) -1 else i
  }

  /** Two-lane signature of the CONCATENATED MPEG frame bytes — the
    * EXACT/RE-TAG audio dedup fingerprint: ID3v2 prefix tags (stacked
    * ones included) and a trailing 128-byte ID3v1 tag are skipped, the
    * frame stream (headers + payloads, VBR streams walked per frame) is
    * hashed in one pass. Returns `(sig1, sig2, audio_bytes)` — two
    * FNV-1a-64 lanes with independent offset bases, total length mixed
    * in, second lane avalanche-finalized (the [[Mp4Kernels.mdatSig]]
    * paired-hash discipline). Null for payloads that are not a clean
    * tag-wrapped MPEG frame stream (see class doc scope). */
  def framesSig(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    val n = b.length
    var i = skipLeadingTags(b)
    if (i < 0) return null
    val p = SigHash.Prime
    var h1 = SigHash.Basis1
    var h2 = SigHash.Basis2
    var total = 0L
    var frames = 0
    var done = false
    while (!done) {
      if (i == n) done = true
      else if (n - i == 128 && b(i) == 'T' && b(i + 1) == 'A' && b(i + 2) == 'G') {
        i = n; done = true // trailing ID3v1 tag
      } else {
        val len = frameLen(b, i)
        if (len < 0 || len > n - i) return null
        val end = i + len
        var j = i
        while (j < end) {
          val x = b(j) & 0xffL
          h1 = (h1 ^ x) * p
          h2 = (h2 ^ x) * p
          j += 1
        }
        total += len
        frames += 1
        i = end
      }
    }
    if (frames == 0) return null
    SigHash.finish(h1, h2, total)
  }

  /** (mpeg_version, layer, sample_rate, n_frames) of a tag-wrapped MPEG
    * frame stream — version/layer/rate from the FIRST frame (streams
    * never legally mix them), frame count from the full walk. Null off
    * the format, same scope as [[framesSig]]. */
  def mp3Meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    val n = b.length
    var i = skipLeadingTags(b)
    if (i < 0) return null
    var ver: String = null
    var layer = 0
    var rate = 0
    var frames = 0
    var done = false
    while (!done) {
      if (i == n) done = true
      else if (n - i == 128 && b(i) == 'T' && b(i + 1) == 'A' && b(i + 2) == 'G') {
        i = n; done = true
      } else {
        val len = frameLen(b, i)
        if (len < 0 || len > n - i) return null
        if (frames == 0) {
          val vb = (b(i + 1) >> 3) & 3
          val lb = (b(i + 1) >> 1) & 3
          val sr = (b(i + 2) >> 2) & 3
          ver = if (vb == 3) "1" else if (vb == 2) "2" else "2.5"
          layer = 4 - lb // header bits 3/2/1 = Layer I/II/III
          rate = if (vb == 3) Sr1(sr) else if (vb == 2) Sr1(sr) / 2
            else Sr1(sr) / 4
        }
        frames += 1
        i += len
      }
    }
    if (frames == 0) return null
    InternalRow(UTF8String.fromString(ver), layer, rate, frames)
  }
}

/** `mp3_frames_sig(binary)` → `struct<sig1 long, sig2 long,
  * audio_bytes long>` (null off the format) — the re-tag-invariant
  * MPEG-frame fingerprint ([[Mp3Kernels.framesSig]]). Codegen'd
  * scan-side expression: one byte pass per row. */
case class Mp3FramesSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("sig1", LongType, nullable = false),
    StructField("sig2", LongType, nullable = false),
    StructField("audio_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp3Kernels.framesSig(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.Mp3Kernels.framesSig($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "mp3_frames_sig"

  override protected def withNewChildInternal(newChild: Expression): Mp3FramesSig =
    copy(child = newChild)
}

/** `mp3_meta(binary)` → `struct<mpeg_version string, layer int,
  * sample_rate int, n_frames int>` (null off the format) — compressed-
  * audio geometry over a 100 TB corpus reads header bytes per frame,
  * never decodes audio ([[Mp3Kernels.mp3Meta]]). */
case class Mp3MetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("mpeg_version", StringType, nullable = false),
    StructField("layer", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp3Kernels.mp3Meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.Mp3Kernels.mp3Meta($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "mp3_meta"

  override protected def withNewChildInternal(newChild: Expression): Mp3MetaExpr =
    copy(child = newChild)
}

/** Deterministic MP3 test fixtures for the frame-signature tier:
  * MPEG-1 Layer III 128 kbps frames with an LCG payload derived from
  * `seed` (sample rate and frame count seed-derived too, so the meta
  * gate has a column-statable oracle). Variant 1 is a RE-TAG of
  * variant 0: IDENTICAL frame bytes, wrapped in a seeded ID3v2 prefix
  * tag and a seeded ID3v1 trailer — the exact transformation
  * [[Mp3Kernels.framesSig]] must see through. */
object Mp3Fixtures {

  def syntheticMp3(seed: Long, variant: Int): Array[Byte] = {
    val srIdx = math.floorMod(seed, 3L).toInt // 0:44100 1:48000 2:32000
    val nFrames = math.floorMod(seed, 5L).toInt + 2
    val rate = Array(44100, 48000, 32000)(srIdx)
    val flen = 144 * 128000 / rate // bitrate index 9 = 128 kbps, no padding
    val frames = new Array[Byte](flen * nFrames)
    var x = seed
    var f = 0
    while (f < nFrames) {
      val o = f * flen
      frames(o) = 0xff.toByte
      frames(o + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      frames(o + 2) = ((9 << 4) | (srIdx << 2)).toByte
      frames(o + 3) = 0x44
      var k = o + 4
      while (k < o + flen) {
        x = x * 6364136223846793005L + 1442695040888963407L
        frames(k) = (x >>> 33).toByte
        k += 1
      }
      f += 1
    }
    if (variant == 0) frames
    else {
      val tagBody = new Array[Byte](32)
      var y = seed ^ 0x5bd1e995L
      var k = 0
      while (k < 32) {
        y = y * 6364136223846793005L + 1442695040888963407L
        tagBody(k) = (y >>> 33).toByte
        k += 1
      }
      val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 32) ++ tagBody
      val id3v1 = new Array[Byte](128)
      id3v1(0) = 'T'; id3v1(1) = 'A'; id3v1(2) = 'G'
      var z = seed ^ 0x9e3779b9L
      k = 3
      while (k < 128) {
        z = z * 6364136223846793005L + 1442695040888963407L
        id3v1(k) = (0x20 + ((z >>> 33) & 0x3f)).toByte // printable junk
        k += 1
      }
      id3v2 ++ frames ++ id3v1
    }
  }
}

/** `synthetic_mp3(seed, variant)` — the deterministic fixture as a
  * column (gate plumbing only, like [[SyntheticMp4]]). */
case class SyntheticMp3(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    Mp3Fixtures.syntheticMp3(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.Mp3Fixtures.syntheticMp3($s, $v)")
  override def prettyName: String = "synthetic_mp3"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticMp3 =
    copy(left = newLeft, right = newRight)
}
