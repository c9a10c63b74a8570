package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** FLAC byte-walk kernels — the lossless-audio leg of the
  * container-invariant dedup family ([[Mp4Kernels.mdatSig]] /
  * [[Mp3Kernels.framesSig]]): a FLAC file is the `fLaC` magic, a chain
  * of METADATA BLOCKS (1-byte last-flag+type header, 24-bit BE length —
  * the published block layout), then audio frames to end of file. Every
  * tag editor rewrites the metadata chain (VORBIS_COMMENT, PICTURE,
  * PADDING) and leaves the frame region untouched, so hashing the bytes
  * AFTER the last metadata block sees through a re-tag without needing
  * a FLAC frame parser at all (unlike MP3, FLAC frame lengths are not
  * header-derivable — but the frame region is a contiguous suffix, so
  * none is needed).
  *
  * Honest scope: byte-identical and re-tagged copies; a re-ENCODE
  * (even lossless-to-lossless at a different compression level)
  * produces different frame bytes and correctly passes. */
object FlacKernels {

  /** Byte offset of the first audio frame (past the magic and the whole
    * metadata chain), or -1 for non-FLAC / malformed chains. */
  private def frameStart(b: Array[Byte]): Int = {
    if (b == null || b.length < 8) return -1
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return -1
    var i = 4
    var last = false
    while (!last) {
      if (i + 4 > b.length) return -1
      last = (b(i) & 0x80) != 0
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
        (b(i + 3) & 0xff)
      i += 4 + len
      if (i > b.length) return -1
    }
    i
  }

  /** Two-lane signature of the audio-frame region — `(sig1, sig2,
    * audio_bytes)`, the family's paired-hash shape. Null off the format
    * or when the frame region is empty (a metadata-only stub carries
    * no audio to deduplicate). */
  def streamSig(b: Array[Byte]): InternalRow = {
    val start = frameStart(b)
    if (start < 0 || start >= b.length) return null
    val p = SigHash.Prime
    var h1 = SigHash.Basis1
    var h2 = SigHash.Basis2
    var j = start
    while (j < b.length) {
      val x = b(j) & 0xffL
      h1 = (h1 ^ x) * p
      h2 = (h2 ^ x) * p
      j += 1
    }
    SigHash.finish(h1, h2, (b.length - start).toLong)
  }

  /** (sample_rate, channels, bits, total_samples) from the STREAMINFO
    * block (type 0, mandatory first block, 34-byte body): sample rate =
    * 20 bits at byte 10, channels-1 = next 3 bits, bits-per-sample-1 =
    * next 5 bits, total samples = next 36 bits — the published packed
    * layout. Null off the format / malformed / non-STREAMINFO first
    * block. */
  def flacMeta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 8 + 34) return null
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return null
    if ((b(4) & 0x7f) != 0) return null // first block must be STREAMINFO
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34) return null
    val o = 8 // STREAMINFO body
    // bytes 10..17 of the body pack rate(20) | chan-1(3) | bps-1(5) | samples(36)
    val rate = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
      ((b(o + 12) & 0xff) >>> 4)
    val channels = (((b(o + 12) & 0xff) >>> 1) & 0x7) + 1
    val bits = ((((b(o + 12) & 0xff) & 0x1) << 4) |
      ((b(o + 13) & 0xff) >>> 4)) + 1
    var samples = ((b(o + 13) & 0xffL) & 0xf) << 32
    samples |= (b(o + 14) & 0xffL) << 24
    samples |= (b(o + 15) & 0xffL) << 16
    samples |= (b(o + 16) & 0xffL) << 8
    samples |= b(o + 17) & 0xffL
    if (rate <= 0) return null // 0 is invalid per spec
    InternalRow(rate, channels, bits, samples)
  }
}

/** `flac_stream_sig(binary)` → `struct<sig1 long, sig2 long,
  * audio_bytes long>` (null off the format) — the re-tag-invariant
  * FLAC fingerprint ([[FlacKernels.streamSig]]). */
case class FlacStreamSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("sig1", LongType, nullable = false),
    StructField("sig2", LongType, nullable = false),
    StructField("audio_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FlacKernels.streamSig(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.FlacKernels.streamSig($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "flac_stream_sig"

  override protected def withNewChildInternal(newChild: Expression): FlacStreamSig =
    copy(child = newChild)
}

/** `flac_meta(binary)` → `struct<sample_rate int, channels int,
  * bits int, total_samples long>` (null off the format) — STREAMINFO
  * geometry from header bytes only ([[FlacKernels.flacMeta]]). */
case class FlacMetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FlacKernels.flacMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.FlacKernels.flacMeta($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "flac_meta"

  override protected def withNewChildInternal(newChild: Expression): FlacMetaExpr =
    copy(child = newChild)
}

/** Deterministic FLAC test fixtures: `fLaC` + STREAMINFO (geometry
  * seed-derived so the meta gate has a column-statable oracle) + an LCG
  * frame region. Variant 1 is a RE-TAG of variant 0: IDENTICAL frame
  * bytes, with a seeded VORBIS_COMMENT block and PADDING inserted into
  * the metadata chain — the exact transformation
  * [[FlacKernels.streamSig]] must see through. */
object FlacFixtures {

  private def blockHeader(last: Boolean, tpe: Int, len: Int): Array[Byte] =
    Array((((if (last) 0x80 else 0) | tpe) & 0xff).toByte,
      ((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (len & 0xff).toByte)

  private def streaminfo(rate: Int, channels: Int, bits: Int,
      samples: Long): Array[Byte] = {
    val b = new Array[Byte](34)
    // min/max block size + frame sizes: arbitrary fixed values
    b(0) = 0x10; b(1) = 0x00; b(2) = 0x10; b(3) = 0x00
    b(10) = ((rate >> 12) & 0xff).toByte
    b(11) = ((rate >> 4) & 0xff).toByte
    b(12) = (((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bits - 1) >> 4) & 0x1)).toByte
    b(13) = ((((bits - 1) & 0xf) << 4) | ((samples >> 32) & 0xf)).toInt.toByte
    b(14) = ((samples >> 24) & 0xff).toByte
    b(15) = ((samples >> 16) & 0xff).toByte
    b(16) = ((samples >> 8) & 0xff).toByte
    b(17) = (samples & 0xff).toByte
    b
  }

  def syntheticFlac(seed: Long, variant: Int): Array[Byte] = {
    val rate = Array(44100, 48000, 96000)(math.floorMod(seed, 3L).toInt)
    val channels = math.floorMod(seed, 2L).toInt + 1
    val bits = if (math.floorMod(seed, 4L) >= 2) 24 else 16
    val samples = math.floorMod(seed, 100000L) + 1
    val frameLen = math.floorMod(seed, 400L).toInt + 64
    val frames = new Array[Byte](frameLen)
    var x = seed
    var k = 0
    while (k < frameLen) {
      x = x * 6364136223846793005L + 1442695040888963407L
      frames(k) = (x >>> 33).toByte
      k += 1
    }
    val magic = Array[Byte]('f', 'L', 'a', 'C')
    val si = streaminfo(rate, channels, bits, samples)
    if (variant == 0)
      magic ++ blockHeader(last = true, tpe = 0, si.length) ++ si ++ frames
    else {
      val comment = new Array[Byte](40) // seeded junk VORBIS_COMMENT body
      var y = seed ^ 0x5bd1e995L
      k = 0
      while (k < comment.length) {
        y = y * 6364136223846793005L + 1442695040888963407L
        comment(k) = (y >>> 33).toByte
        k += 1
      }
      magic ++ blockHeader(last = false, tpe = 0, si.length) ++ si ++
        blockHeader(last = false, tpe = 4, comment.length) ++ comment ++
        blockHeader(last = true, tpe = 1, 16) ++ new Array[Byte](16) ++
        frames
    }
  }
}

/** `synthetic_flac(seed, variant)` — the deterministic fixture as a
  * column (gate plumbing only, like [[SyntheticMp3]]). */
case class SyntheticFlac(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    FlacFixtures.syntheticFlac(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.FlacFixtures.syntheticFlac($s, $v)")
  override def prettyName: String = "synthetic_flac"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticFlac =
    copy(left = newLeft, right = newRight)
}
