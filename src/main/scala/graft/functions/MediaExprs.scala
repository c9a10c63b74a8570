package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Byte-level media-header kernels: REAL parsing of the container
  * formats' published header layouts — no codec libraries involved, so
  * unlike pixel decode this does not need stubbing. Shared by the eval
  * and codegen paths of [[ImageDims]]. */
object MediaKernels {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def le24(b: Array[Byte], i: Int): Int =
    ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  /** (width, height) from PNG / GIF / JPEG / WebP / BMP headers, null for
    * anything else (or malformed/truncated headers — never throws).
    *
    *  - PNG: IHDR is mandated first chunk → width/height BE32 at 16/20.
    *  - GIF: logical screen descriptor → LE16 at 6/8.
    *  - JPEG: walk the segment chain to the first SOF marker (C0–CF minus
    *    C4/C8/CC); height BE16 at +5, width at +7.
    *  - BMP: BITMAPINFOHEADER → LE32 at 18/22 (|height| — negative means
    *    top-down row order).
    */
  def imageDims(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val n = b.length
    // PNG signature
    if (n >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G') {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return InternalRow(w.toInt, h.toInt)
    }
    // GIF87a / GIF89a
    if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) return null
      return InternalRow(w, h)
    }
    // JPEG: FF D8 then marker segments
    if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < n) {
        if ((b(i) & 0xff) != 0xff) return null // lost sync
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 } // standalone
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= n) return null
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          if (w <= 0 || h <= 0) return null
          return InternalRow(w, h)
        } else {
          if (i + 3 >= n) return null
          i += 2 + be16(b, i + 2)
        }
      }
      return null
    }
    // WebP (RIFF container) — the dominant modern web image format.
    // Three published frame layouts:
    //  - VP8X (extended): canvas (width−1, height−1) as LE24 pairs
    //    after the 4 flag/reserved bytes;
    //  - VP8L (lossless): signature 0x2F then 14-bit (w−1, h−1) packed
    //    LSB-first in the next 32 bits;
    //  - "VP8 " (lossy): keyframe start code 9D 01 2A then 14-bit LE16
    //    width/height.
    if (n >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      if (n >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == 'X') {
        val w = 1 + le24(b, 24); val h = 1 + le24(b, 27)
        return InternalRow(w, h)
      }
      if (n >= 25 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == 'L' && (b(20) & 0xff) == 0x2f) {
        val bits = le32(b, 21)
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >> 14) & 0x3fff).toInt + 1
        return InternalRow(w, h)
      }
      if (n >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == ' ' && (b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 &&
          (b(25) & 0xff) == 0x2a) {
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w <= 0 || h <= 0) return null
        return InternalRow(w, h)
      }
      return null
    }
    // BMP
    if (n >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18); val hRaw = le32(b, 22)
      // height is SIGNED little-endian 32-bit
      val h = math.abs(hRaw.toInt).toLong
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return InternalRow(w.toInt, h.toInt)
    }
    null
  }
}

/** `image_dims(binary)` → `struct<width int, height int>` (null when the
  * payload is not a recognized image container). Codegen'd scan-side
  * expression: dimension extraction over a 100 TB media corpus reads
  * only header bytes per row and never leaves the scan stage. */
case class ImageDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaKernels.imageDims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.MediaKernels.imageDims($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "image_dims"

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object Mp4Kernels {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** (major_brand, timescale, duration, n_tracks) from an ISO-BMFF
    * (MP4/MOV) container, walking the published box layout: `ftyp` must
    * lead (its brand identifies the flavor), `moov` holds one `mvhd`
    * (movie timescale + duration; version 0 = 32-bit fields, version 1 =
    * 64-bit) and one `trak` per track. Null for non-BMFF or malformed
    * input — never throws, and malformed sizes can never stall or
    * reverse the cursor (same Long-cursor discipline as
    * [[WavKernels.wavMeta]]). Boxes with size 1 carry a 64-bit
    * largesize; size 0 means to-end-of-buffer (legal only for the last
    * top-level box). Header-only payloads (no `mdat`) still report their
    * movie geometry — media stored out-of-band. */
  def mp4Meta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    val n = b.length
    // box walk helper returns the payload size or -1 on malformed; a
    // size reaching past the buffer is CLAMPED OUT as malformed here —
    // a 64-bit largesize near Long.MaxValue would otherwise overflow
    // `i += size` and cycle the cursor forever (the WAV kernel's u32
    // sizes cannot overflow a Long; 64-bit ones can)
    def boxSize(i: Long): Long = {
      val s = be32(b, i.toInt)
      val raw =
        if (s == 1L) {
          // the largesize header alone is 16 bytes: a declared size in
          // [8, 16) would advance the cursor into the middle of its own
          // header and misparse header bytes as boxes — malformed
          if (i + 16 > n) -1L
          else { val ls = be64(b, i.toInt + 8); if (ls < 16) -1L else ls }
        }
        else if (s == 0L) n - i // to end of buffer
        else s
      if (raw > n - i) -1L else raw
    }
    if (!tag(b, 4, "ftyp")) return null
    val brand = new String(b, 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var i = 0L
    var sawMoov = false
    while (i + 8 <= n && !sawMoov) {
      val size = boxSize(i)
      if (size < 8) return null
      if (tag(b, i.toInt + 4, "moov")) {
        sawMoov = true
        val end = i + size // boxSize clamps to the buffer
        val hdr = if (be32(b, i.toInt) == 1L) 16L else 8L
        var j = i + hdr
        while (j + 8 <= end) {
          val cs = {
            val s = be32(b, j.toInt)
            val raw =
              if (s == 1L) { // same [8, 16) largesize guard as boxSize
                if (j + 16 > end) -1L
                else { val ls = be64(b, j.toInt + 8); if (ls < 16) -1L else ls }
              }
              else if (s == 0L) end - j
              else s
            if (raw > end - j) -1L else raw
          }
          if (cs < 8) return null
          if (tag(b, j.toInt + 4, "mvhd")) {
            // field reads are bounded by the mvhd box's OWN declared
            // extent (j + cs), not just the enclosing moov end: a
            // malformed mvhd whose size is smaller than its fields must
            // not read sibling-box bytes as timescale/duration (cs is
            // already clamped to <= end - j above, so this subsumes the
            // moov bound). The payload starts after the box HEADER,
            // which is 16 bytes when the size field is 1 (largesize) —
            // a fixed +8 would read the largesize bytes as the version
            // and shift every field by 8.
            val hdr = if (be32(b, j.toInt) == 1L) 16L else 8L
            val mvhdEnd = j + cs
            if (j + hdr + 1 > mvhdEnd) return null
            val v = b((j + hdr).toInt) & 0xff
            if (v == 1) {
              if (j + hdr + 4 + 8 + 8 + 4 + 8 > mvhdEnd) return null
              timescale = be32(b, (j + hdr + 20).toInt)
              duration = be64(b, (j + hdr + 24).toInt)
            } else {
              if (j + hdr + 4 + 4 + 4 + 4 + 4 > mvhdEnd) return null
              timescale = be32(b, (j + hdr + 12).toInt)
              duration = be32(b, (j + hdr + 16).toInt)
            }
          } else if (tag(b, j.toInt + 4, "trak")) {
            nTracks += 1
          }
          j += cs
        }
      }
      i += size
    }
    // timescale is u32 per the spec; a value past Int.MaxValue would
    // wrap negative under .toInt in a non-nullable field — treat it as
    // malformed like the WAV kernel's sample-rate guard
    if (!sawMoov || timescale <= 0 || timescale > Int.MaxValue ||
      duration < 0) return null
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(brand),
      timescale.toInt, duration, nTracks)
  }

  /** Two-lane signature of the CONCATENATED `mdat` payload bytes — the
    * EXACT/RE-MUX video dedup fingerprint for ISO-BMFF (MP4/MOV)
    * containers: a re-mux (moved `moov`, edited metadata, changed
    * brand, inserted `free` boxes, reordered top-level boxes) rewrites
    * everything EXCEPT the media data, so hashing only the mdat bytes
    * sees through it, while full perceptual dedup would need an H.264
    * decoder the public JDK does not ship (honest scope: byte-identical
    * and re-muxed copies, not re-ENCODES — the AVI tier's pixel path
    * covers those for the containers the JDK can decode).
    *
    * Returns `(sig1, sig2, mdat_bytes)`: two FNV-1a-64 lanes over the
    * same one byte pass with independent offset bases, total length
    * mixed in, and the second lane avalanche-finalized (murmur fmix64)
    * — the catalog family's paired-hash discipline (a false drop needs
    * a simultaneous two-lane collision). Null for non-BMFF payloads
    * (no leading `ftyp`), malformed walks, or containers with no mdat
    * bytes (header-only stubs carry no media to deduplicate). Same
    * Long-cursor/clamp discipline as [[mp4Meta]]. */
  def mdatSig(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    val n = b.length
    if (!tag(b, 4, "ftyp")) return null
    val p = SigHash.Prime
    var h1 = SigHash.Basis1
    var h2 = SigHash.Basis2
    var total = 0L
    var i = 0L
    while (i + 8 <= n) {
      val s = be32(b, i.toInt)
      val raw =
        if (s == 1L) { if (i + 16 > n) -1L else be64(b, i.toInt + 8) }
        else if (s == 0L) n - i // to end of buffer
        else s
      val size = if (raw > n - i) -1L else raw
      // the largesize form's header alone is 16 bytes, so a declared
      // size in [8, 16) would advance the cursor into the middle of its
      // own header and misparse header bytes as boxes — malformed, null
      if (size < 8 || (s == 1L && size < 16)) return null
      if (tag(b, i.toInt + 4, "mdat")) {
        val hdr = if (s == 1L) 16L else 8L
        var j = i + hdr
        val end = i + size
        while (j < end) {
          val x = b(j.toInt) & 0xffL
          h1 = (h1 ^ x) * p
          h2 = (h2 ^ x) * p
          total += 1L
          j += 1L
        }
      }
      i += size
    }
    if (total == 0L) return null
    SigHash.finish(h1, h2, total)
  }
}

/** `mp4_mdat_sig(binary)` → `struct<sig1 long, sig2 long,
  * mdat_bytes long>` (null for non-BMFF / header-only payloads) — the
  * re-mux-invariant media-data fingerprint ([[Mp4Kernels.mdatSig]]).
  * Codegen'd scan-side expression: one byte pass per row, no
  * allocation beyond the 3-field row. */
case class Mp4MdatSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("sig1", LongType, nullable = false),
    StructField("sig2", LongType, nullable = false),
    StructField("mdat_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4Kernels.mdatSig(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.Mp4Kernels.mdatSig($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "mp4_mdat_sig"

  override protected def withNewChildInternal(newChild: Expression): Mp4MdatSig =
    copy(child = newChild)
}

/** Deterministic ISO-BMFF test fixtures for the mdat-signature tier:
  * `ftyp` + `moov(mvhd, trak)` + `mdat` with an LCG payload derived
  * from `seed`. Variant 1 is a RE-MUX of variant 0: IDENTICAL mdat
  * payload bytes, but a different major brand, `mdat` moved before
  * `moov`, an inserted `free` box, and different movie metadata — the
  * exact transformation [[Mp4Kernels.mdatSig]] must see through (and
  * [[Mp4Kernels.mp4Meta]] must report differently). */
object Mp4Fixtures {

  private def box(tag: String, body: Array[Byte]): Array[Byte] = {
    val size = 8 + body.length
    val out = new Array[Byte](size)
    out(0) = ((size >> 24) & 0xff).toByte
    out(1) = ((size >> 16) & 0xff).toByte
    out(2) = ((size >> 8) & 0xff).toByte
    out(3) = (size & 0xff).toByte
    var i = 0
    while (i < 4) { out(4 + i) = tag.charAt(i).toByte; i += 1 }
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def syntheticMp4(seed: Long, variant: Int,
      payloadBytes: Int = 256): Array[Byte] = {
    val payload = new Array[Byte](payloadBytes)
    var x = seed
    var i = 0
    while (i < payloadBytes) {
      x = x * 6364136223846793005L + 1442695040888963407L
      payload(i) = (x >>> 33).toByte
      i += 1
    }
    val brand = if (variant == 0) "isom" else "mp42"
    val ftyp = box("ftyp", (brand + "    ")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // mvhd v0 body: version+flags, creation, modification, timescale,
    // duration (the fields mp4Meta reads), then a zero tail
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0L) ++ be32(0L) ++
        be32(if (variant == 0) 600L else 1000L) ++
        be32((seed & 0x7fffffffL) + variant) ++ new Array[Byte](80))
    val moov = box("moov", mvhd ++ box("trak", Array.empty[Byte]))
    val mdat = box("mdat", payload)
    if (variant == 0) ftyp ++ moov ++ mdat
    else ftyp ++ box("free", new Array[Byte](12)) ++ mdat ++ moov
  }
}

/** `synthetic_mp4(seed, variant)` — the deterministic fixture as a
  * column (gate plumbing only, like [[SyntheticAvi]]). */
case class SyntheticMp4(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    Mp4Fixtures.syntheticMp4(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.Mp4Fixtures.syntheticMp4($s, $v, 256)")
  override def prettyName: String = "synthetic_mp4"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticMp4 =
    copy(left = newLeft, right = newRight)
}

/** `mp4_meta(binary)` → `struct<major_brand string, timescale int,
  * duration long, n_tracks int>` (null when the payload is not an
  * ISO-BMFF container). Codegen'd scan-side expression like
  * [[ImageDims]]/[[WavMeta]]: video-container geometry over a 100 TB
  * corpus reads only header bytes per row. */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4Kernels.mp4Meta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.Mp4Kernels.mp4Meta($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "mp4_meta"

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object WavKernels {

  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** (channels, sample_rate, bits_per_sample, data_bytes) from a RIFF/
    * WAVE header, walking the chunk chain to `fmt ` and `data` per the
    * published container layout; null for non-WAV or malformed input —
    * never throws. `data_bytes` is the declared data-chunk size, so
    * header-only payloads (media stored out-of-band) still report their
    * audio geometry. Chunks are padded to even offsets per the RIFF
    * spec. */
  def wavMeta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    val n = b.length
    var channels = -1
    var rate = -1L
    var bits = -1
    var dataBytes = -1L
    var i = 12L
    while (i + 8 <= n && (channels < 0 || dataBytes < 0)) {
      val ii = i.toInt
      val size = le32(b, ii + 4) // unsigned u32 — keep it a Long: a
      // truncated .toInt on a huge declared size would go negative and
      // stall or reverse the cursor (malformed input must not hang)
      if (tag(b, ii, "fmt ")) {
        if (i + 8 + 16 > n || size < 16) return null
        channels = le16(b, ii + 10)
        rate = le32(b, ii + 12)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data")) {
        dataBytes = size
      }
      // chunk payloads are word-aligned: odd sizes carry a pad byte;
      // Long arithmetic keeps the cursor strictly advancing even when the
      // declared size overflows the remaining buffer (loop then exits)
      i += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 ||
      dataBytes < 0) return null
    InternalRow(channels, rate.toInt, bits, dataBytes)
  }
}

/** `wav_meta(binary)` → `struct<channels int, sample_rate int, bits int,
  * data_bytes long>` (null when the payload is not a RIFF/WAVE
  * container). Codegen'd scan-side expression like [[ImageDims]]: audio
  * geometry over a 100 TB corpus reads only header bytes per row. */
case class WavMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("data_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WavKernels.wavMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.WavKernels.wavMeta($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "wav_meta"

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}
