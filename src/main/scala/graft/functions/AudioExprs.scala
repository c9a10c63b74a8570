package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** PCM audio kernels: REAL sample decode of RIFF/WAVE PCM payloads —
  * the published container + sample layout ([[WavKernels]] already walks
  * the chunk chain for metadata; this reads the `data` chunk's samples),
  * no codec library involved. The audio leg of the multimodal dedup
  * tier: where images get a DCT perceptual hash, PCM audio gets a
  * VOLUME-INVARIANT energy-envelope difference hash.
  *
  * The RIFF chunk walk here is deliberately a THIRD private copy
  * (siblings: [[WavKernels.wavMeta]] metadata-only, [[VideoKernels]]
  * AVI lists) — each kernel's walk carries different state and bounds,
  * and the shared part is ~10 lines; a chunk-walk hardening must be
  * checked against all three (cross-referenced so none is missed). */
object AudioKernels {

  /** Same guard class as [[ImageKernels.MaxPixels]]: never materialize
    * more than ~16M samples from one payload (declared sizes are also
    * clamped to the actual buffer, so a lying header cannot allocate
    * past the payload). */
  val MaxSamples: Long = 1L << 24

  /** Decode the PCM samples of a RIFF/WAVE payload to mono doubles in
    * [-1, 1]: uncompressed PCM only (format tag 1), 8-bit unsigned or
    * 16-bit signed little-endian (the two published PCM sample layouts
    * that cover real WAV corpora), channels averaged to mono. Null for
    * non-WAV / non-PCM / malformed / empty-data payloads — never throws.
    * The read is bounded by min(declared data size, bytes actually
    * present), so truncated crawl payloads decode their prefix. */
  def pcmMono(b: Array[Byte]): Array[Double] = {
    if (b == null || b.length < 44) return null
    def tag(i: Int, t: String): Boolean =
      b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
        b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)
    def le16(i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
    def le32(i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    val n = b.length
    var fmtTag = -1; var channels = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    var i = 12L
    while (i + 8 <= n && (channels < 0 || dataOff < 0)) {
      val ii = i.toInt
      val size = le32(ii + 4)
      if (tag(ii, "fmt ")) {
        if (i + 8 + 16 > n || size < 16) return null
        fmtTag = le16(ii + 8)
        channels = le16(ii + 10)
        bits = le16(ii + 22)
      } else if (tag(ii, "data")) {
        dataOff = i + 8
        dataLen = math.min(size, n - dataOff) // clamp to what is present
      }
      i += 8L + size + (size & 1L)
    }
    if (fmtTag != 1 || channels <= 0 || dataOff < 0 || dataLen <= 0) return null
    val bytesPerSample = bits match {
      case 8 => 1
      case 16 => 2
      case _ => return null // PCM layouts beyond 8/16-bit: not decoded here
    }
    val frameBytes = bytesPerSample * channels
    val frames = dataLen / frameBytes
    if (frames <= 0 || frames > MaxSamples) return null
    val out = new Array[Double](frames.toInt)
    var f = 0
    while (f < frames) {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val off = (dataOff + f.toLong * frameBytes + c * bytesPerSample).toInt
        acc += (if (bytesPerSample == 1) ((b(off) & 0xff) - 128) / 128.0
                else (((b(off + 1) << 8) | (b(off) & 0xff)).toShort) / 32768.0)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    out
  }

  /** 64-bit energy-envelope difference hash: the mono samples split into
    * 65 equal windows, RMS energy per window, bit k = energy(k+1) >
    * energy(k) — the dHash idea in the time domain. VOLUME-INVARIANT by
    * construction (scaling every sample scales every RMS equally, and
    * only comparisons survive), so re-encoded/normalized copies of a
    * recording collide while different material lands ~32 bits apart.
    * Null for undecodable payloads or fewer than 65 samples (one sample
    * per window is the floor under which an envelope is meaningless). */
  def envelopeHash64(b: Array[Byte]): java.lang.Long = {
    val s = pcmMono(b)
    if (s == null || s.length < 65) return null
    val w = 65
    val energies = new Array[Double](w)
    var k = 0
    while (k < w) {
      val lo = (k.toLong * s.length / w).toInt
      val hi = math.max(lo + 1, ((k + 1).toLong * s.length / w).toInt)
      var acc = 0.0
      var i = lo
      while (i < hi) { acc += s(i) * s(i); i += 1 }
      energies(k) = acc / (hi - lo)
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (energies(k + 1) > energies(k)) hash |= 1L << k
      k += 1
    }
    hash
  }
}

/** Deterministic WAV-PCM test fixtures, the audio mirror of
  * [[ImageFixtures]]: 16-bit mono PCM of 65 square-wave windows whose
  * amplitudes are seed-derived GRID values (multiples of 1/32 in
  * [4/32, 28/32], adjacent windows forced distinct) — so the 64
  * envelope-gradient bits are a seed-determined coin-flip pattern
  * (distinct seeds land ~32 bits apart), while the grid gap (≥1/32 in
  * RMS, against ~3e-5 of 16-bit quantization noise) makes every
  * comparison robust to sample rounding at BOTH volumes:
  *
  *  - variant 0: the base recording.
  *  - variant 1: HALF VOLUME — every sample scaled by 0.5: different
  *    bytes, identical envelope hash (the invariance the kernel claims),
  *    the planted perceptual near-duplicate that byte-exact dedup
  *    cannot see.
  */
object AudioFixtures {

  private val SamplesPerWindow = 64
  private val Windows = 65

  /** The planted PNG-discipline WAV for (seed, variant): header bytes by
    * the published layout, then 65×64 16-bit LE samples. */
  def syntheticWav(seed: Long, variant: Int): Array[Byte] = {
    var z = seed
    def next(): Long = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val amps = new Array[Double](Windows)
    var prev = -1
    var w0 = 0
    while (w0 < Windows) {
      var lvl = 4 + ((next() >>> 8) % 25L).toInt // 4..28 of /32 grid
      if (lvl == prev) lvl = if (lvl == 28) 27 else lvl + 1
      amps(w0) = lvl / 32.0
      prev = lvl
      w0 += 1
    }
    val scale = if (variant == 1) 0.5 else 1.0
    val samples = new Array[Short](Windows * SamplesPerWindow)
    var w = 0
    while (w < Windows) {
      var i = 0
      while (i < SamplesPerWindow) {
        // square wave at amplitude amps(w): RMS == amplitude exactly
        val v = (if (i % 2 == 0) amps(w) else -amps(w)) * scale
        samples(w * SamplesPerWindow + i) = math.round(v * 32767).toShort
        i += 1
      }
      w += 1
    }
    encodeWav(samples, sampleRate = 8000)
  }

  /** Minimal 16-bit mono PCM WAV encoder — every byte defined by the
    * RIFF spec, zero encoder freedom. */
  private def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(1) // PCM, mono
    out.putInt(sampleRate).putInt(sampleRate * 2)
    out.putShort(2).putShort(16) // block align, bits
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}

/** `audio_envelope_hash(binary)` → 64-bit volume-invariant energy-
  * envelope hash (long), null for non-PCM/undecodable payloads.
  * Codegen'd scan-side expression like [[ImagePHash]] — the PCM decode
  * is the per-row cost; downstream moves 8-byte longs. */
case class AudioEnvelopeHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    AudioKernels.envelopeHash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}Tmp = graft.functions.AudioKernels.envelopeHash64($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp.longValue(); }
    """)
  override def prettyName: String = "audio_envelope_hash"
  override protected def withNewChildInternal(newChild: Expression): AudioEnvelopeHash =
    copy(child = newChild)
}

/** `synthetic_wav(seed, variant)` — planted-fixture generator for the
  * audio oracle gates ([[AudioFixtures.syntheticWav]]). Test-fixture
  * surface, not a production operator. */
case class SyntheticWav(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    AudioFixtures.syntheticWav(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.AudioFixtures.syntheticWav($s, $v)")
  override def prettyName: String = "synthetic_wav"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticWav =
    copy(left = newLeft, right = newRight)
}
