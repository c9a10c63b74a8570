package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Video-container kernels: REAL frame extraction from AVI (RIFF) /
  * MJPEG payloads — the published RIFF layout ([[WavKernels]] walks the
  * same container family for audio): `RIFF('AVI ')` → `LIST('movi')` →
  * `00dc`/`01dc`/`00db` video-frame chunks, each frame a self-contained
  * compressed image that [[ImageKernels.decode]] reads (JPEG for real
  * MJPEG; the decode sniffs content, so losslessly-coded frames work
  * too — which is what the deterministic fixtures plant, keeping oracle
  * contracts bit-exact where JPEG decode would be JRE-version-
  * dependent). This is the video leg of the multimodal dedup tier:
  * sample frames evenly, pHash each, and a video's fingerprint is its
  * frame-hash sequence.
  */
object VideoKernels {

  /** Hostile-input caps (the [[ImageKernels.MaxPixels]] guard class): a
    * crafted payload of millions of tiny frame chunks must not allocate
    * an unbounded offset table, and nested LIST groups must not recurse
    * an unbounded stack — both found in the r12 self-review. Sampling
    * needs the chunk COUNT for even coverage, so the table is capped
    * (2²⁰ frames ≈ 9.7 h at 30 fps — any real video fits) rather than
    * streamed. */
  val MaxFrameChunks = 1 << 20
  val MaxListDepth = 64

  /** Byte offsets + lengths of the video-frame chunks inside an
    * AVI/RIFF payload, in stream order; null for non-AVI or malformed
    * input — never throws, cursor strictly advances (the WavKernels
    * Long-cursor discipline; declared sizes clamped to the buffer).
    * Descends into `LIST('movi')` and the interleaving `LIST('rec ')`
    * groups the published AVI layout wraps frame-time chunks in; the
    * walk is ITERATIVE over an explicit bounded range stack. */
  def aviFrameChunks(b: Array[Byte]): Array[(Int, Int)] = {
    if (b == null || b.length < 24) return null
    def tag(i: Long, t: String): Boolean =
      b(i.toInt) == t.charAt(0) && b(i.toInt + 1) == t.charAt(1) &&
        b(i.toInt + 2) == t.charAt(2) && b(i.toInt + 3) == t.charAt(3)
    def le32(i: Long): Long = {
      val ii = i.toInt
      ((b(ii + 3) & 0xffL) << 24) | ((b(ii + 2) & 0xffL) << 16) |
        ((b(ii + 1) & 0xffL) << 8) | (b(ii) & 0xffL)
    }
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return null
    val n = b.length
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isFrameTag(i: Long): Boolean = {
      // '##dc' (compressed) / '##db' (uncompressed) video chunks, any
      // stream number — the published stream-chunk naming
      val c2 = b(i.toInt + 2); val c3 = b(i.toInt + 3)
      b(i.toInt) >= '0' && b(i.toInt) <= '9' &&
        b(i.toInt + 1) >= '0' && b(i.toInt + 1) <= '9' &&
        ((c2 == 'd' && (c3 == 'c' || c3 == 'b')))
    }
    // explicit (from, to, depth) stack, IN-ORDER DFS — on a descendable
    // LIST the remainder of the current range is pushed as the resume
    // point and the list body is scanned first, so frames keep stream
    // order across sibling 'rec ' groups; a crafted tower of nested
    // LIST headers can neither blow the thread stack (depth cap) nor,
    // with the frame cap, grow memory past the bounded table
    var stack = List((12L, n.toLong, 0))
    while (stack.nonEmpty && frames.size < MaxFrameChunks) {
      var (i, to, depth) = stack.head
      stack = stack.tail
      var descended = false
      while (!descended && i + 8 <= to && frames.size < MaxFrameChunks) {
        val size = le32(i + 4)
        val body = i + 8
        val clamped = math.min(size, to - body)
        if (clamped < 0) { i = to } // truncated header: stop this range
        else {
          val next = body + clamped + (clamped & 1L) // word-aligned like WAV
          if (tag(i, "LIST") && clamped >= 4 && depth < MaxListDepth &&
            (tag(body, "movi") || tag(body, "rec "))) {
            stack = (body + 4, body + clamped, depth + 1) ::
              (next, to, depth) :: stack
            descended = true
          } else {
            if (isFrameTag(i) && clamped > 0)
              frames += ((body.toInt, clamped.toInt))
            i = next
          }
        }
      }
    }
    if (frames.isEmpty) null else frames.toArray
  }

  /** Evenly-sampled per-frame perceptual hashes: up to `n` frames from
    * the container (first/last included when n > 1), each decoded and
    * pHashed ([[ImageKernels.phash64]]); an undecodable frame
    * contributes nothing. Null when the payload is not a video container
    * or no sampled frame decodes. */
  def framePhashes(b: Array[Byte], n: Int): ArrayData = {
    val chunks = aviFrameChunks(b)
    if (chunks == null) return null
    val k = math.min(n, chunks.length)
    val out = new scala.collection.mutable.ArrayBuffer[Long](k)
    var j = 0
    while (j < k) {
      val idx =
        if (k == 1) 0
        else ((j.toLong * (chunks.length - 1)) / (k - 1)).toInt
      val (off, len) = chunks(idx)
      val frame = java.util.Arrays.copyOfRange(b, off, off + len)
      val h = ImageKernels.phash64(frame)
      if (h != null) out += h.longValue()
      j += 1
    }
    if (out.isEmpty) null else ArrayData.toArrayData(out.toArray)
  }
}

/** Deterministic AVI/MJPEG-shaped test fixtures: a RIFF('AVI ') container
  * holding `frames` planted image frames ([[ImageFixtures.syntheticPng]]
  * — losslessly decodable, so the hashes are bit-deterministic; real
  * MJPEG carries JPEG frames, which the kernel decodes identically via
  * content sniffing). Variant 1 re-encodes every frame as its 2×-upscale
  * brightness-shifted near-dup: different bytes and frame sizes,
  * per-frame pHash within the blocking radius. */
object VideoFixtures {

  def syntheticAvi(seed: Long, variant: Int, frames: Int = 4): Array[Byte] = {
    val payloads = (0 until frames).map(f =>
      ImageFixtures.syntheticPng(seed * 1000003L + f, variant))
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    payloads.foreach { p =>
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(Array[Byte]((p.length & 0xff).toByte,
        ((p.length >> 8) & 0xff).toByte, ((p.length >> 16) & 0xff).toByte,
        ((p.length >> 24) & 0xff).toByte))
      movi.write(p)
      if (p.length % 2 == 1) movi.write(0) // word alignment
    }
    val moviBytes = movi.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val riffLen = 4 + 8 + moviBytes.length
    out.write(Array[Byte]((riffLen & 0xff).toByte, ((riffLen >> 8) & 0xff).toByte,
      ((riffLen >> 16) & 0xff).toByte, ((riffLen >> 24) & 0xff).toByte))
    out.write("AVI ".getBytes("US-ASCII"))
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte]((moviBytes.length & 0xff).toByte,
      ((moviBytes.length >> 8) & 0xff).toByte,
      ((moviBytes.length >> 16) & 0xff).toByte,
      ((moviBytes.length >> 24) & 0xff).toByte))
    out.write(moviBytes)
    out.toByteArray
  }
}

/** `video_frame_phashes(binary, n)` → `array<long>` of up to `n` evenly-
  * sampled per-frame perceptual hashes (null for non-video payloads).
  * Codegen'd scan-side expression; the frame decodes are the column
  * cost, downstream moves small long arrays. */
case class VideoFramePhashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0 && n <= 64, s"sampled frame count out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    VideoKernels.framePhashes(input.asInstanceOf[Array[Byte]], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}Tmp =
        graft.functions.VideoKernels.framePhashes($c, $n);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)
  override def prettyName: String = "video_frame_phashes"
  override protected def withNewChildInternal(newChild: Expression): VideoFramePhashes =
    copy(child = newChild)
}

/** `synthetic_avi(seed, variant)` — planted-fixture generator for the
  * video oracle gates ([[VideoFixtures.syntheticAvi]]). Test-fixture
  * surface, not a production operator. */
case class SyntheticAvi(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    VideoFixtures.syntheticAvi(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.VideoFixtures.syntheticAvi($s, $v, 4)")
  override def prettyName: String = "synthetic_avi"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticAvi =
    copy(left = newLeft, right = newRight)
}
