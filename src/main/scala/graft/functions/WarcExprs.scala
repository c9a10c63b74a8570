package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC/WET crawl-archive byte-walk kernels — the FRONT DOOR of a
  * training-data pipeline (no reference analogue: clockpipe starts from
  * database rows; a web-scale corpus starts from Common-Crawl-style WARC
  * segments, and until now graft started from an already-materialized
  * `documents` table).
  *
  * Format (ISO 28500 / WARC 1.0-1.1, public): a WARC file is a
  * concatenation of records — `WARC/1.0\r\n`, named header lines
  * (`WARC-Type`, `WARC-Target-URI`, `WARC-Date`, `Content-Type`,
  * `Content-Length`), a blank line, `Content-Length` bytes of block,
  * then `\r\n\r\n`. Crawl archives ship each record as its own GZIP
  * MEMBER with the members concatenated (so a reader can skip records
  * without inflating the rest); WET extracts are the same framing with
  * `conversion` records carrying extracted plain text. `response`
  * records carry a full HTTP response (status line, headers, payload)
  * as their block — [[WarcKernels.httpResponse]] is the second-layer
  * parser for those.
  *
  * Refusal discipline (the media-kernel family rule): a malformed file
  * — bad version line, header without a colon, missing mandatory
  * `WARC-Type`/`Content-Length`, block overrunning the buffer, missing
  * inter-record `\r\n\r\n`, trailing bytes, or a corrupt gzip stream —
  * returns null for the WHOLE file rather than a prefix of it: a
  * half-parsed crawl segment silently dropping its tail is a
  * completeness bug no downstream count would catch.
  *
  * Scale shape: the kernels are pure byte walks (codegen'd, one pass,
  * no allocation beyond the output rows), so ingestion parallelism is
  * entirely the file layout's: gzip members make a WARC file
  * non-splittable, and the published practice (Spark and Hadoop WARC
  * readers alike) is one ~1 GB segment file per task across however
  * many thousand segments the crawl has. See [[graft.sources.Warc]]
  * for the scan-side contract. */
object WarcKernels {

  private val GzipMagic0: Byte = 0x1f.toByte
  private val GzipMagic1: Byte = 0x8b.toByte

  /** Inflate ALL gzip members of a concatenated-member stream (the
    * crawl-archive layout). Null on corrupt input. Non-gzip input is
    * returned as-is — plain WARC concatenations are legal too.
    *
    * This is a MANUAL member walk (header parse → raw Inflater → CRC32
    * + ISIZE trailer check per member), not `GZIPInputStream`, for two
    * review-found reasons: (a) `GZIPInputStream` treats a MALFORMED
    * next-member header as clean EOF, silently returning a PREFIX of
    * the segment — exactly the half-parsed-tail completeness bug the
    * whole-file-refusal contract exists to prevent (a corrupt second
    * member or trailing garbage must be null, not a shorter parse);
    * (b) pre-sizing an output buffer from `b.length * 4` overflows Int
    * on ordinary ~0.5 GB segments. Here every byte of input must be
    * accounted for by a valid member, every member's CRC32 and ISIZE
    * must check out, and the output buffer grows from a constant. */
  def gunzipAll(b: Array[Byte]): Array[Byte] = gunzipAll(b, MaxInflatedBytes)

  /** Inflated-size ceiling for [[gunzipAll]]: one byte array holds the
    * whole inflated segment, so the JVM's array limit is the hard wall —
    * a segment inflating past it must REFUSE (null, countable like every
    * other corruption) rather than die mid-allocation with
    * OutOfMemoryError, which would fail the task instead of surfacing a
    * countable refusal row. Segments near this wall belong to a
    * re-segmentation job (the ~1 GB-compressed crawl convention keeps
    * real segments far below it). */
  val MaxInflatedBytes: Int = Int.MaxValue - 16

  /** [[gunzipAll]] with an explicit inflated-size cap (test seam — the
    * production cap is a 2 GB allocation nobody unit-tests). */
  def gunzipAll(b: Array[Byte], maxInflated: Int): Array[Byte] = {
    if (b == null) return null
    if (b.length < 2 || b(0) != GzipMagic0 || b(1) != GzipMagic1) return b
    val out = new java.io.ByteArrayOutputStream(256 * 1024)
    val buf = new Array[Byte](64 * 1024)
    var i = 0
    while (i < b.length) {
      // fixed header: magic, CM=8 (deflate), FLG, MTIME(4), XFL, OS
      if (i + 10 > b.length || b(i) != GzipMagic0 || b(i + 1) != GzipMagic1 ||
        b(i + 2) != 8) return null
      val flg = b(i + 3) & 0xff
      var p = i + 10
      if ((flg & 4) != 0) { // FEXTRA: LE16 length + payload
        if (p + 2 > b.length) return null
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > b.length) return null
      }
      if ((flg & 8) != 0) { // FNAME: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return null
        p += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
        while (p < b.length && b(p) != 0) p += 1
        if (p >= b.length) return null
        p += 1
      }
      if ((flg & 2) != 0) { // FHCRC: LE16, not verified (deflate+CRC32 are)
        p += 2
        if (p > b.length) return null
      }
      val inf = new java.util.zip.Inflater(true)
      val crc = new java.util.zip.CRC32
      var memberLen = 0L
      var failed = false
      try {
        inf.setInput(b, p, b.length - p)
        while (!failed && !inf.finished()) {
          val n = try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => failed = true; 0 }
          if (!failed) {
            if (n == 0 && inf.needsInput()) failed = true // truncated deflate
            else if (out.size().toLong + n > maxInflated) return null // cap
            else {
              crc.update(buf, 0, n)
              out.write(buf, 0, n)
              memberLen += n
            }
          }
        }
        if (!failed) p += (b.length - p) - inf.getRemaining
      } finally inf.end()
      if (failed) return null
      // trailer: CRC32 + ISIZE (uncompressed length mod 2^32), both LE32
      if (p + 8 > b.length) return null
      def le32u(at: Int): Long =
        (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
          ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
      if (le32u(p) != crc.getValue) return null
      if (le32u(p + 4) != (memberLen & 0xffffffffL)) return null
      i = p + 8
    }
    out.toByteArray
  }

  /** Index of the first `\r\n` at/after `i`, or -1. */
  private def crlf(b: Array[Byte], i: Int): Int = {
    var j = i
    while (j + 1 < b.length) {
      if (b(j) == '\r' && b(j + 1) == '\n') return j
      j += 1
    }
    -1
  }

  /** HTTP header-line decode: RFC 9110 field values are historically
    * Latin-1 (and in practice opaque bytes) — ISO-8859-1 round-trips
    * every byte, so nothing is lost. WARC headers use [[utf8]] instead. */
  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** WARC header-line decode: ISO 28500 §4 headers are UTF-8 — a
    * WARC-Target-URI with multi-byte UTF-8 must surface intact, not as
    * Latin-1 mojibake. Framing stays byte-based ([[crlf]]), so a
    * malformed UTF-8 sequence cannot shift record boundaries (it decodes
    * to U+FFFD inside the value only). */
  private def utf8(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  /** Parse a (possibly multi-member-gzipped) WARC/WET file into its
    * records: `array<struct<rec_type, url, date, content_type string,
    * block binary>>`. Null on any malformation (whole-file refusal, see
    * the object doc); empty input → empty array. Header names are
    * case-insensitive per spec; folded continuation lines (leading
    * SP/HT) append to the previous value. */
  def warcRecords(raw: Array[Byte]): ArrayData = {
    val b = gunzipAll(raw)
    if (b == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < b.length) {
      // version line
      val ve = crlf(b, i)
      if (ve < 0 || !utf8(b, i, ve).startsWith("WARC/")) return null
      i = ve + 2
      // header lines until the blank line
      var recType: String = null
      var url: String = null
      var date: String = null
      var ctype: String = null
      var clen = -1L
      var lastName: String = null
      var headerDone = false
      while (!headerDone) {
        val le = crlf(b, i)
        if (le < 0) return null
        if (le == i) { headerDone = true; i += 2 }
        else {
          val line = utf8(b, i, le)
          i = le + 2
          if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') &&
              lastName != null) {
            // folded continuation: extend the previous header's value
            val cont = line.trim
            lastName match {
              case "warc-target-uri" => url = url + " " + cont
              case "warc-date" => date = date + " " + cont
              case "content-type" => ctype = ctype + " " + cont
              case _ => ()
            }
          } else {
            val colon = line.indexOf(':')
            if (colon <= 0) return null
            val name = line.substring(0, colon).trim
              .toLowerCase(java.util.Locale.ROOT)
            val value = line.substring(colon + 1).trim
            lastName = name
            name match {
              case "warc-type" => recType = value
              case "warc-target-uri" => url = value
              case "warc-date" => date = value
              case "content-type" => ctype = value
              case "content-length" =>
                clen = try value.toLong catch { case _: NumberFormatException => -1L }
                if (clen < 0) return null
              case _ => ()
            }
          }
        }
      }
      if (recType == null || clen < 0) return null // mandatory per spec
      if (i + clen > b.length) return null
      val block = java.util.Arrays.copyOfRange(b, i, (i + clen).toInt)
      i = (i + clen).toInt
      // inter-record separator: exactly two CRLFs
      if (i + 4 > b.length || b(i) != '\r' || b(i + 1) != '\n' ||
        b(i + 2) != '\r' || b(i + 3) != '\n') return null
      i += 4
      def u(s: String): UTF8String =
        if (s == null) null else UTF8String.fromString(s)
      out += InternalRow(u(recType), u(url), u(date), u(ctype), block)
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Parse an HTTP response block (a `response` record's payload) into
    * `struct<status int, mime string, body binary>`: status from the
    * status line, `mime` = the Content-Type value lowercased with its
    * parameters stripped (null when absent), `body` = everything after
    * the header terminator (crawlers truncate long payloads, so a
    * Content-Length larger than the remaining bytes is NOT an error —
    * the bytes present are the payload). Null when the block is not an
    * HTTP response. */
  def httpResponse(block: Array[Byte]): InternalRow = {
    if (block == null) return null
    val se = crlf(block, 0)
    if (se < 0) return null
    val status = ascii(block, 0, se)
    if (!status.startsWith("HTTP/")) return null
    val parts = status.split(" ", 3)
    if (parts.length < 2) return null
    val code = try parts(1).toInt catch { case _: NumberFormatException => return null }
    if (code < 100 || code > 999) return null
    var i = se + 2
    var mime: String = null
    var headerDone = false
    while (!headerDone) {
      val le = crlf(block, i)
      if (le < 0) return null
      if (le == i) { headerDone = true; i += 2 }
      else {
        val line = ascii(block, i, le)
        i = le + 2
        val colon = line.indexOf(':')
        if (colon > 0) {
          val name = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          if (name == "content-type") {
            var v = line.substring(colon + 1).trim
            val semi = v.indexOf(';')
            if (semi >= 0) v = v.substring(0, semi).trim
            mime = v.toLowerCase(java.util.Locale.ROOT)
          }
        }
      }
    }
    val body = java.util.Arrays.copyOfRange(block, i, block.length)
    InternalRow(code,
      if (mime == null) null else UTF8String.fromString(mime), body)
  }
}

/** Deterministic synthetic WARC files for gates and specs (the
  * `synthetic_mp4`/`synthetic_ogg` pattern: fixture generation is part
  * of the library so the oracle gate can build its input column-side).
  *
  * Variants pin the framings a crawl reader must treat identically:
  *   - 0: plain concatenation (warcinfo + request + response records;
  *     the response's HTTP payload is `body` as text/plain)
  *   - 1: the SAME records, each compressed as its own gzip member,
  *     members concatenated — the actual crawl-archive layout; parse
  *     output must be byte-identical to variant 0
  *   - 2: a WET-style extract (warcinfo + one `conversion` record whose
  *     block IS `body` as text/plain — no HTTP layer) */
object WarcFixtures {

  private val Crlf = "\r\n"

  def urlOf(seed: Long): String = s"http://example.com/doc/$seed"

  def dateOf(seed: Long): String =
    f"2026-08-16T00:00:${java.lang.Math.floorMod(seed, 60L)}%02dZ"

  private def record(headers: Seq[(String, String)],
      block: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0").append(Crlf)
    headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append(Crlf) }
    h.append("Content-Length: ").append(block.length).append(Crlf).append(Crlf)
    val head = h.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  def syntheticWarc(seed: Long, variant: Int, body: Array[Byte]): Array[Byte] = {
    val url = urlOf(seed)
    val date = dateOf(seed)
    val u8 = java.nio.charset.StandardCharsets.ISO_8859_1
    val info = record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:graft:$seed:info>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft-synthetic/1.0${Crlf}format: WARC File Format 1.0$Crlf"
        .getBytes(u8))
    if (variant == 2) {
      val conv = record(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Target-URI" -> url,
        "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:graft:$seed:conv>",
        "Content-Type" -> "text/plain"),
        body)
      return info ++ conv
    }
    val req = record(Seq(
      "WARC-Type" -> "request",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:graft:$seed:req>",
      "Content-Type" -> "application/http;msgtype=request"),
      (s"GET /doc/$seed HTTP/1.1${Crlf}Host: example.com$Crlf" +
        s"User-Agent: graft$Crlf$Crlf").getBytes(u8))
    val http =
      (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/plain; charset=UTF-8$Crlf" +
        s"Content-Length: ${body.length}$Crlf$Crlf").getBytes(u8) ++ body
    val resp = record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:graft:$seed:resp>",
      "Content-Type" -> "application/http;msgtype=response"),
      http)
    val records = Seq(info, req, resp)
    if (variant == 1) records.map(gzipMember).reduce(_ ++ _)
    else records.reduce(_ ++ _)
  }
}

/** `warc_records(binary)` → `array<struct<rec_type, url, date,
  * content_type string, block binary>>` — whole-file WARC/WET record
  * walk with transparent multi-member gunzip; null on malformation
  * ([[WarcKernels.warcRecords]]). */
case class WarcRecordsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("block", BinaryType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    WarcKernels.warcRecords(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}Tmp =
        graft.functions.WarcKernels.warcRecords($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)
  override def prettyName: String = "warc_records"
  override protected def withNewChildInternal(newChild: Expression): WarcRecordsExpr =
    copy(child = newChild)
}

/** `http_response(binary)` → `struct<status int, mime string, body
  * binary>` — second-layer parse of a `response` record's block
  * ([[WarcKernels.httpResponse]]). */
case class HttpResponseExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    WarcKernels.httpResponse(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      InternalRow ${ev.value}Tmp =
        graft.functions.WarcKernels.httpResponse($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)
  override def prettyName: String = "http_response"
  override protected def withNewChildInternal(newChild: Expression): HttpResponseExpr =
    copy(child = newChild)
}

/** `synthetic_warc(seed, variant, body)` — the deterministic fixture
  * as a column (gate plumbing only, like [[SyntheticOgg]]); `body` is
  * UTF-8-encoded into the record payload. */
case class SyntheticWarc(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType, StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(seed: Any, variant: Any, body: Any): Any =
    WarcFixtures.syntheticWarc(seed.asInstanceOf[Long],
      variant.asInstanceOf[Int], body.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v, b) =>
      s"graft.functions.WarcFixtures.syntheticWarc($s, $v, $b.getBytes())")
  override def prettyName: String = "synthetic_warc"
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SyntheticWarc =
    copy(first = newFirst, second = newSecond, third = newThird)
}
