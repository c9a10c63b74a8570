package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ogg container byte-walk kernels — the last audio container leg
  * (after [[Mp3Kernels]], [[FlacKernels]] and [[Mp4Kernels]]'s M4A/AAC
  * coverage): an Ogg physical stream is a sequence of PAGES (`OggS`
  * capture, 27-byte header, a lacing table, segment data — the
  * published framing), carrying a logical stream of PACKETS (lacing
  * values accumulate; < 255 ends a packet, packets span pages). A
  * re-tag rewrites the COMMENT header packet (VorbisComment/OpusTags)
  * and therefore re-segments, re-numbers and re-CRCs every following
  * page — but the AUDIO packets' bytes are untouched. So the signature
  * reassembles packets, skips the codec's header packets (sniffed from
  * packet 0: `vorbis` → 3 headers, `OpusHead` → 2), and hashes
  * the remaining packets' bytes with each packet's LENGTH mixed at its
  * boundary (two streams with the same bytes under different packet
  * boundaries are different audio and must not collide).
  *
  * Honest scope, stated plainly: single logical stream only (grouped/
  * chained multiplexed Oggs → null), Vorbis and Opus codecs (anything
  * else → null), page CRCs not verified (payload equality is the dedup
  * concern; corrupt framing either breaks the walk → null, or leaves
  * bytes identical → harmless). Re-ENCODES produce new packets and
  * correctly pass. */
object OggKernels {

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private val VorbisMagic = Array[Byte](1, 'v', 'o', 'r', 'b', 'i', 's')
  private val OpusMagic = "OpusHead".getBytes("US-ASCII")

  /** Header-packet count for the sniffed codec, or -1 when unknown. */
  private def headerPackets(sniff: Array[Byte], len: Int): Int = {
    def is(m: Array[Byte]) =
      len >= m.length && java.util.Arrays.equals(
        java.util.Arrays.copyOf(sniff, m.length), m)
    if (is(VorbisMagic)) 3 else if (is(OpusMagic)) 2 else -1
  }

  /** Two-lane signature of the AUDIO packet stream — `(sig1, sig2,
    * audio_bytes)`, the [[graft.dedup.SigDedup]] family shape. Null off
    * the format / malformed / header-only streams. */
  def packetsSig(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 28) return null
    val p = SigHash.Prime
    var h1 = SigHash.Basis1
    var h2 = SigHash.Basis2
    var total = 0L
    var serial = 0L
    var first = true
    var eos = false
    var skip = -1 // header packets to skip; decided from packet 0's sniff
    var packetIdx = 0
    var packetLen = 0L
    val sniff = new Array[Byte](8)
    var sniffLen = 0
    var i = 0
    while (i < b.length && !eos) {
      if (i + 27 > b.length) return null
      if (!(b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
        b(i + 3) == 'S')) return null
      if (b(i + 4) != 0) return null // stream structure version
      val htype = b(i + 5) & 0xff
      val ser = le32(b, i + 14)
      if (first) {
        if ((htype & 2) == 0) return null // first page must carry BOS
        serial = ser
      } else if (ser != serial) return null // multiplexed: out of scope
      val nseg = b(i + 26) & 0xff
      if (i + 27 + nseg > b.length) return null
      var dataOff = i + 27 + nseg
      var s = 0
      while (s < nseg) {
        val lac = b(i + 27 + s) & 0xff
        if (dataOff + lac > b.length) return null
        // packet 0's first bytes feed the codec sniff
        if (packetIdx == 0 && sniffLen < sniff.length) {
          var k = 0
          while (k < lac && sniffLen < sniff.length) {
            sniff(sniffLen) = b(dataOff + k); sniffLen += 1; k += 1
          }
          if (sniffLen == sniff.length || lac < 255) {
            skip = headerPackets(sniff, sniffLen)
            if (skip < 0) return null
          }
        }
        if (skip >= 0 && packetIdx >= skip) {
          var k = 0
          while (k < lac) {
            val x = b(dataOff + k) & 0xffL
            h1 = (h1 ^ x) * p
            h2 = (h2 ^ x) * p
            k += 1
          }
          total += lac
        }
        packetLen += lac
        if (lac < 255) { // packet boundary
          if (skip >= 0 && packetIdx >= skip) {
            h1 = (h1 ^ packetLen) * p
            h2 = (h2 ^ java.lang.Long.rotateLeft(packetLen, 17)) * p
          }
          packetIdx += 1
          packetLen = 0L
        }
        dataOff += lac
        s += 1
      }
      eos = (htype & 4) != 0
      first = false
      i = dataOff
    }
    // the stream must CLOSE (EOS seen, no packet left open, no trailing
    // bytes) and carry at least one audio packet
    if (!eos || packetLen != 0L || i != b.length || skip < 0 ||
      packetIdx <= skip || total == 0L) return null
    SigHash.finish(h1, h2, total)
  }

  /** (codec, channels, sample_rate, n_audio_packets) from the
    * identification header + the packet walk: Vorbis id packet carries
    * channels at byte 11 and a LE32 rate at 12; OpusHead carries
    * channels at 9 and the LE32 input rate at 12. Null off the format,
    * same scope as [[packetsSig]]. */
  def oggMeta(b: Array[Byte]): InternalRow = {
    // reuse the strict walk for framing validation + packet counting
    val sig = packetsSig(b)
    if (sig == null) return null
    // packet 0 is at the first page's first segments; its first 16
    // bytes are enough for both codecs and never span pages in practice
    // (both id headers are < 255 bytes and must be alone on page 0 —
    // the specs require it; enforced loosely by reading page 0 only)
    val nseg = b(26) & 0xff
    val d0 = 27 + nseg
    // packet 0's OWN length from page 0's lacing table: the id header
    // must cover the fixed field offsets, else a malformed magic-only
    // first packet (7-byte \x01vorbis / 8-byte OpusHead — enough to pass
    // the sniff) would read channels/rate from the NEXT packet's bytes
    var p0len = 0
    var seg = 0
    var p0done = false
    while (seg < nseg && !p0done) {
      val lac0 = b(27 + seg) & 0xff
      p0len += lac0
      if (lac0 < 255) p0done = true
      seg += 1
    }
    // id header must terminate on page 0 (the specs require it alone
    // there) and meet the smaller spec minimum (OpusHead = 19 bytes)
    if (!p0done || p0len < 19 || d0 + p0len > b.length) return null
    val isVorbis = b(d0) == 1 && b(d0 + 1) == 'v'
    if (isVorbis && p0len < 30) return null // Vorbis id header spec minimum
    val codec = if (isVorbis) "vorbis" else "opus"
    val channels = if (isVorbis) b(d0 + 11) & 0xff else b(d0 + 9) & 0xff
    val rate = le32(b, d0 + 12).toInt // both codecs carry the rate at +12
    if (channels <= 0 || rate <= 0) return null
    // count audio packets by re-walking lacing boundaries
    var audioPackets = 0
    var packetIdx = 0
    val skip = if (isVorbis) 3 else 2
    var i = 0
    var eos = false
    while (i < b.length && !eos) {
      val ns = b(i + 26) & 0xff
      var dataOff = i + 27 + ns
      var s = 0
      while (s < ns) {
        val lac = b(i + 27 + s) & 0xff
        if (lac < 255) {
          if (packetIdx >= skip) audioPackets += 1
          packetIdx += 1
        }
        dataOff += lac
        s += 1
      }
      eos = (b(i + 5) & 4) != 0
      i = dataOff
    }
    InternalRow(UTF8String.fromString(codec), channels, rate, audioPackets)
  }
}

/** `ogg_packets_sig(binary)` → `struct<sig1 long, sig2 long,
  * audio_bytes long>` (null off the format) — the re-tag-invariant Ogg
  * packet-stream fingerprint ([[OggKernels.packetsSig]]). */
case class OggPacketsSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("sig1", LongType, nullable = false),
    StructField("sig2", LongType, nullable = false),
    StructField("audio_bytes", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    OggKernels.packetsSig(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.OggKernels.packetsSig($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "ogg_packets_sig"

  override protected def withNewChildInternal(newChild: Expression): OggPacketsSig =
    copy(child = newChild)
}

/** `ogg_meta(binary)` → `struct<codec string, channels int,
  * sample_rate int, n_audio_packets int>` (null off the format) —
  * Vorbis/Opus identification-header geometry ([[OggKernels.oggMeta]]). */
case class OggMetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_audio_packets", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    OggKernels.oggMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp = graft.functions.OggKernels.oggMeta($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override def prettyName: String = "ogg_meta"

  override protected def withNewChildInternal(newChild: Expression): OggMetaExpr =
    copy(child = newChild)
}

/** Deterministic Ogg test fixtures: a single logical Vorbis or Opus
  * stream (codec = seed parity — both codecs exercised in one gate),
  * id + comment (+ setup for Vorbis) header packets, then seeded LCG
  * audio packets, paged with a chosen lacing-table width. Variant 1 is
  * a RE-TAG of variant 0: IDENTICAL audio packets, but a different
  * vendor string in the comment packet, a different page width (so
  * every page boundary moves), and shifted sequence numbers — the
  * exact transformation [[OggKernels.packetsSig]] must see through. */
object OggFixtures {

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Page a packet sequence: lacing values packed `maxSegs` per page;
    * BOS on the first page, EOS on the last, continuation flag when a
    * page starts mid-packet. CRCs left zero (not part of the kernel's
    * contract). */
  def buildPages(packets: Seq[Array[Byte]], serial: Long, maxSegs: Int,
      seqStart: Long): Array[Byte] = {
    // flatten to (lacing, segment-bytes) pairs; packets whose length is
    // a multiple of 255 need the trailing 0 lacing
    val segs = packets.flatMap { pkt =>
      val full = pkt.length / 255
      val rem = pkt.length % 255
      val lacings = Seq.fill(full)(255) :+ rem
      var off = 0
      lacings.map { lac =>
        val seg = java.util.Arrays.copyOfRange(pkt, off, off + lac)
        off += lac
        (lac, seg)
      }
    }
    val pages = segs.grouped(maxSegs).toSeq
    val out = new java.io.ByteArrayOutputStream()
    var midPacket = false
    pages.zipWithIndex.foreach { case (page, pi) =>
      var htype = 0
      if (pi == 0) htype |= 2
      if (pi == pages.size - 1) htype |= 4
      if (midPacket) htype |= 1
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0) // version
      out.write(htype)
      out.write(new Array[Byte](8)) // granule (ignored by the kernel)
      out.write(le32(serial))
      out.write(le32(seqStart + pi))
      out.write(new Array[Byte](4)) // crc (not verified)
      out.write(page.size)
      page.foreach { case (lac, _) => out.write(lac) }
      page.foreach { case (_, seg) => out.write(seg, 0, seg.length) }
      midPacket = page.last._1 == 255
    }
    out.toByteArray
  }

  def syntheticOgg(seed: Long, variant: Int): Array[Byte] = {
    val vorbis = math.floorMod(seed, 2L) == 0L
    val rate = Array(44100, 48000, 32000)(math.floorMod(seed, 3L).toInt)
    val channels = math.floorMod(seed, 2L).toInt + 1
    val nAudio = math.floorMod(seed, 4L).toInt + 2
    val id: Array[Byte] =
      if (vorbis)
        // spec-complete 30 bytes: type+magic+version+channels+rate+
        // 3 bitrates + blocksizes (0xB8 = 256/2048) + framing bit
        Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
          new Array[Byte](4) ++ Array(channels.toByte) ++ le32(rate) ++
          new Array[Byte](12) ++ Array[Byte](0xb8.toByte, 1)
      else
        "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
          new Array[Byte](2) ++ le32(rate) ++ new Array[Byte](3)
    def comment(vendor: String): Array[Byte] = {
      val v = vendor.getBytes("US-ASCII")
      (if (vorbis) Array[Byte](3) ++ "vorbis".getBytes("US-ASCII")
       else "OpusTags".getBytes("US-ASCII")) ++
        le32(v.length) ++ v ++ le32(0)
    }
    val setup: Seq[Array[Byte]] =
      if (vorbis) Seq(Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++
        new Array[Byte](20))
      else Seq.empty
    var x = seed
    val audio = (0 until nAudio).map { j =>
      val len = math.floorMod(seed + 37L * j, 400L).toInt + 10
      val pkt = new Array[Byte](len)
      var k = 0
      while (k < len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        pkt(k) = (x >>> 33).toByte
        k += 1
      }
      pkt
    }
    if (variant == 0)
      buildPages(Seq(id, comment("graft-a")) ++ setup ++ audio,
        serial = seed & 0x7fffffffL, maxSegs = 50, seqStart = 0L)
    else
      buildPages(
        Seq(id, comment(s"graft-b-retagged-$seed")) ++ setup ++ audio,
        serial = seed & 0x7fffffffL, maxSegs = 3, seqStart = 7L)
  }
}

/** `synthetic_ogg(seed, variant)` — the deterministic fixture as a
  * column (gate plumbing only, like [[SyntheticFlac]]). */
case class SyntheticOgg(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any): Any =
    OggFixtures.syntheticOgg(seed.asInstanceOf[Long], variant.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.OggFixtures.syntheticOgg($s, $v)")
  override def prettyName: String = "synthetic_ogg"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SyntheticOgg =
    copy(left = newLeft, right = newRight)
}
