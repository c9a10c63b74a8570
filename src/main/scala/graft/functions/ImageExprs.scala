package graft.functions

import java.awt.image.BufferedImage
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Pixel-level image kernels: REAL decode via `javax.imageio` (JDK-built-in
  * PNG/JPEG/GIF/BMP codecs — public platform API, no new dependencies),
  * shared by the perceptual-hash expressions below and by
  * [[graft.multimodal.Multimodal]]'s feature extraction. This replaces the
  * r11-era declared decode stub: the batch plumbing was already real; the
  * pixels now are too.
  *
  * Determinism note: PNG decode is bit-exact everywhere (DEFLATE + defined
  * filters); JPEG decode is deterministic within a JRE but codec-version-
  * dependent across platforms — which is why every decode-derived value in
  * the oracle gates is a Spark-computed CONTRACT boolean over planted PNG
  * fixtures, never a cross-engine-compared hash.
  */
object ImageKernels {

  // per-payload decode must never touch disk: ImageIO's default stream
  // cache writes temp files per read, pure overhead at corpus scale
  javax.imageio.ImageIO.setUseCache(false)

  /** Decompression-bomb guard: a 100 TB crawl WILL contain pathological
    * headers; refuse to materialize more than ~16M pixels per image
    * (64 MB of int ARGB) rather than OOM an executor. */
  val MaxPixels: Long = 1L << 24

  /** Decode to a BufferedImage, null for undecodable/oversized/empty
    * payloads — never throws (crawl data is hostile by default). The
    * dimension guard reads the HEADER via the reader API before any
    * raster is allocated: checking after `ImageIO.read` would let a
    * small compressed bomb allocate its multi-GB raster first (and the
    * resulting OutOfMemoryError is not a NonFatal) — found in the r12
    * self-review. */
  def decode(b: Array[Byte]): BufferedImage =
    if (b == null || b.length == 0) null
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val w = r.getWidth(0)
              val h = r.getHeight(0)
              if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) null
              else r.read(0)
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => null }

  /** ITU-R BT.601 luma of an ARGB pixel (the published SDTV weighting;
    * for r=g=b gray pixels this is exactly the gray value since the
    * weights sum to 1). */
  @inline private def lumaOf(argb: Int): Double = {
    val r = (argb >> 16) & 0xff
    val g = (argb >> 8) & 0xff
    val bl = argb & 0xff
    0.299 * r + 0.587 * g + 0.114 * bl
  }

  /** Area-averaged luma resample to `tw`×`th` (row-major, ts(y*tw + x)).
    * Pure integer box bounds + left-to-right double accumulation —
    * deterministic everywhere (Java 17 FP is strict), unlike Graphics2D
    * interpolation which is rendering-pipeline-dependent. For integer
    * downscale ratios the boxes tile exactly (a 2x nearest-upscaled
    * image resamples back to its source bit-for-bit — the invariance the
    * perceptual-hash specs pin). */
  def lumaResample(img: BufferedImage, tw: Int, th: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * h / th).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * h / th).toInt)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * w / tw).toInt
        val x1 = math.max(x0 + 1, ((tx + 1).toLong * w / tw).toInt)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          val row = y * w
          while (x < x1) { sum += lumaOf(argb(row + x)); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = sum / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  // --- pHash: 32×32 luma → 2D DCT-II → top-left 8×8 → median threshold
  // (Zauner 2010, "Implementation and Benchmarking of Perceptual Image
  // Hash Functions" — the classic pHash.org algorithm).

  private val PSize = 32
  private val PBlock = 8
  /** cosTab(u)(x) = cos(π·u·(2x+1) / (2·PSize)) for u < PBlock. */
  private val cosTab: Array[Array[Double]] = Array.tabulate(PBlock, PSize) {
    (u, x) => math.cos(math.Pi * u * (2 * x + 1) / (2.0 * PSize))
  }
  private def aCoef(u: Int): Double =
    if (u == 0) math.sqrt(1.0 / PSize) else math.sqrt(2.0 / PSize)

  /** 64-bit perceptual hash; null (boxed) for undecodable payloads. Bit
    * (8u+v) = DCT(u,v) > median of the 64 low-frequency coefficients.
    * Identical pixels ⇒ identical hash; brightness shifts move only the
    * DC coefficient; small local edits flip few bits — near-duplicates
    * land within small Hamming distance (the SimHash property, in pixel
    * space). */
  def phash64(b: Array[Byte]): java.lang.Long = {
    val img = decode(b)
    if (img == null) return null
    val p = lumaResample(img, PSize, PSize)
    // separable DCT restricted to the PBlock×PBlock low-frequency corner:
    // t(u)(y) = Σ_x p(x,y)·cos_u(x), then c(u)(v) = a(u)a(v) Σ_y t(u)(y)·cos_v(y)
    val t = Array.ofDim[Double](PBlock, PSize)
    var u = 0
    while (u < PBlock) {
      var y = 0
      while (y < PSize) {
        var sum = 0.0
        var x = 0
        while (x < PSize) { sum += p(y * PSize + x) * cosTab(u)(x); x += 1 }
        t(u)(y) = sum
        y += 1
      }
      u += 1
    }
    val c = new Array[Double](PBlock * PBlock)
    u = 0
    while (u < PBlock) {
      var v = 0
      while (v < PBlock) {
        var sum = 0.0
        var y = 0
        while (y < PSize) { sum += t(u)(y) * cosTab(v)(y); y += 1 }
        c(u * PBlock + v) = aCoef(u) * aCoef(v) * sum
        v += 1
      }
      u += 1
    }
    val sorted = c.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(PBlock * PBlock / 2 - 1) + sorted(PBlock * PBlock / 2)) / 2.0
    var hash = 0L
    var i = 0
    while (i < PBlock * PBlock) {
      if (c(i) > median) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** 64-bit difference hash ("dHash", Krawetz 2013 — the published
    * gradient hash): 9×8 luma, bit (8y+x) = l(y,x) > l(y,x+1). Cheaper
    * than pHash (no DCT) and brightness-invariant by construction (a
    * constant shift cancels in every comparison); less robust to
    * resampling. Null for undecodable payloads. */
  def dhash64(b: Array[Byte]): java.lang.Long = {
    val img = decode(b)
    if (img == null) return null
    val p = lumaResample(img, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (p(y * 9 + x) > p(y * 9 + x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Luma-histogram feature vector (`featureDim` equal-width bins over
    * [0, 256), L1-normalized) — the real pixel-decode feature extractor
    * behind [[graft.multimodal.Multimodal.decodeFeatures]]. Null for
    * undecodable payloads. */
  def lumaHistogram(b: Array[Byte], featureDim: Int): Array[Float] = {
    val img = decode(b)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    val f = new Array[Float](featureDim)
    var i = 0
    while (i < argb.length) {
      val bin = math.min(featureDim - 1, (lumaOf(argb(i)) * featureDim / 256.0).toInt)
      f(bin) += 1.0f
      i += 1
    }
    var k = 0
    while (k < featureDim) { f(k) /= argb.length; k += 1 }
    f
  }
}

/** Deterministic PNG test fixtures for the image-dedup oracle gates: a
  * 32×32 gray image whose low-frequency DCT signs are planted from an LCG
  * of `seed` — so distinct seeds yield perceptually FAR images (~half the
  * 63 planted AC signs differ ⇒ pHash Hamming ≈ Binomial(63, ½)) while
  * the variants are controlled perturbations:
  *
  *  - variant 0: the base image.
  *  - variant 1: 2× nearest-neighbor upscale (64×64) + a +4 brightness
  *    shift — DIFFERENT bytes and dimensions, IDENTICAL 32×32 area
  *    resample modulo the DC shift ⇒ a perceptual near-duplicate that
  *    byte-exact dedup cannot see (the planted near-dup).
  *
  * The PNG bytes are hand-assembled (stored-block zlib + CRC32, the
  * published container layout) so fixture generation is byte-deterministic
  * across executors and JVMs — nothing here depends on an encoder's
  * compression choices; decode exercises the REAL ImageIO PNG codec.
  */
object ImageFixtures {

  private val Amp = 20.0

  /** The planted 32×32 luma plane for `seed` (values safely inside
    * [0, 255] — no clamping, so the DCT of the rounded image recovers the
    * planted signs up to ~±1 rounding noise against ±20 amplitudes). */
  private def basePlane(seed: Long): Array[Int] = {
    // 63 planted AC signs from a SplitMix64-style mix of the seed —
    // deterministic, seed-sensitive in every bit
    var z = seed
    def next(): Long = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val bits0 = next(); val bits1 = next()
    def sign(k: Int): Double =
      if (((if (k < 63) bits0 else bits1) >> (k % 63) & 1L) == 1L) 1.0 else -1.0
    val p = new Array[Int](32 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        var acc = 128.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u != 0 || v != 0) {
              val a = (if (u == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32)) *
                (if (v == 0) math.sqrt(1.0 / 32) else math.sqrt(2.0 / 32))
              acc += Amp * sign(u * 8 + v) * a *
                math.cos(math.Pi * u * (2 * x + 1) / 64.0) *
                math.cos(math.Pi * v * (2 * y + 1) / 64.0)
            }
            v += 1
          }
          u += 1
        }
        p(y * 32 + x) = math.max(0, math.min(255, math.round(acc).toInt))
        x += 1
      }
      y += 1
    }
    p
  }

  /** Minimal 8-bit RGB PNG encoder (r=g=b gray values in COLOR TYPE 2 —
    * Java's grayscale color type decodes through a CS_GRAY→sRGB
    * transform that does NOT preserve sample values, while 8-bit RGB is
    * identity): IHDR + one IDAT of zlib STORED blocks (filter 0 per row)
    * + IEND — every byte defined by the spec, zero encoder freedom. */
  private def encodePng(p: Array[Int], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) // RGB, 8-bit
    // raw scanlines: filter byte 0 + w RGB triples (r=g=b) per row
    val stride = 3 * w + 1
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      raw(y * stride) = 0
      var x = 0
      while (x < w) {
        val v = p(y * w + x).toByte
        raw(y * stride + 1 + 3 * x) = v
        raw(y * stride + 2 + 3 * x) = v
        raw(y * stride + 3 + 3 * x) = v
        x += 1
      }
      y += 1
    }
    // zlib: 0x78 0x01 header, stored deflate blocks (≤65535 bytes each),
    // Adler-32 trailer — deterministic by construction
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    var off = 0
    while (off < raw.length) {
      val len = math.min(65535, raw.length - off)
      val last = if (off + len >= raw.length) 1 else 0
      z.write(last)
      z.write(len & 0xff); z.write((len >> 8) & 0xff)
      z.write(~len & 0xff); z.write((~len >> 8) & 0xff)
      z.write(raw, off, len)
      off += len
    }
    var a = 1L; var bsum = 0L
    raw.foreach { byte => a = (a + (byte & 0xff)) % 65521; bsum = (bsum + a) % 65521 }
    z.write(be32(((bsum << 16) | a).toInt))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** The planted PNG for (seed, variant) — see class doc. Unknown
    * variants mirror variant 0. */
  def syntheticPng(seed: Long, variant: Int): Array[Byte] = {
    val base = basePlane(seed)
    if (variant == 1) {
      // 2× nearest-neighbor upscale + brightness +4: new bytes/dims,
      // same area-resampled luma shape (DC-only DCT change)
      val up = new Array[Int](64 * 64)
      var y = 0
      while (y < 64) {
        var x = 0
        while (x < 64) {
          up(y * 64 + x) = math.min(255, base((y / 2) * 32 + x / 2) + 4)
          x += 1
        }
        y += 1
      }
      encodePng(up, 64, 64)
    } else encodePng(base, 32, 32)
  }
}

/** `image_phash(binary)` → 64-bit perceptual hash (long), null for
  * undecodable payloads. Codegen'd scan-side expression — the per-row
  * work is the real pixel decode, so this IS the heavy column; everything
  * downstream of it (quarter blocking, Hamming joins) moves 8-byte longs.
  */
case class ImagePHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ImageKernels.phash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}Tmp = graft.functions.ImageKernels.phash64($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp.longValue(); }
    """)
  override def prettyName: String = "image_phash"
  override protected def withNewChildInternal(newChild: Expression): ImagePHash =
    copy(child = newChild)
}

/** `image_dhash(binary)` → 64-bit difference hash (long), null for
  * undecodable payloads. See [[ImageKernels.dhash64]]. */
case class ImageDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ImageKernels.dhash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}Tmp = graft.functions.ImageKernels.dhash64($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp.longValue(); }
    """)
  override def prettyName: String = "image_dhash"
  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}

/** `synthetic_png(seed, variant)` — the planted-fixture generator as an
  * expression so oracle gates can build decodable images executor-side,
  * derived entirely from table columns ([[ImageFixtures.syntheticPng]]).
  * Test-fixture surface, not a production operator. */
case class SyntheticPng(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    ImageFixtures.syntheticPng(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.ImageFixtures.syntheticPng($s, $v)")
  override def prettyName: String = "synthetic_png"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticPng =
    copy(left = newLeft, right = newRight)
}
