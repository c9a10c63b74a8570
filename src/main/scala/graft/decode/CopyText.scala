package graft.decode

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** PostgreSQL `COPY ... TO STDOUT` text-format parser.
  *
  * Incremental and chunk-boundary safe (reference:
  * `src/adapter/postgres.rs:473-515`): a backslash seen as the last byte of
  * one chunk must suppress the separator meaning of a `\t`/`\n` arriving at
  * the start of the next chunk, and multi-byte UTF-8 sequences may be split
  * across chunks — both handled by byte-level state carried between `feed`
  * calls.
  *
  * Field unescaping (reference: `src/adapter/postgres.rs:362-471`):
  *  - the field consisting of exactly `\N` is NULL;
  *  - `\b \f \n \r \t \v \\` C-style escapes;
  *  - `\xH` / `\xHH` hex escapes (no valid hex digit → literal `x`);
  *  - `\o`/`\oo`/`\ooo` octal escapes;
  *  - a backslash before any other byte yields that byte;
  *  - a trailing lone backslash is kept literally.
  * All escape handling is byte-level, so escaped UTF-8 sequences reassemble.
  */
object CopyText {

  /** Decode one raw (still-escaped) field body to its string value. */
  def decodeField(input: Array[Byte]): String = {
    val out = new ArrayBuffer[Byte](input.length)
    var i = 0
    while (i < input.length) {
      val b = input(i)
      if (b != '\\') { out += b; i += 1 }
      else {
        i += 1
        if (i >= input.length) { out += '\\'; }
        else {
          input(i) match {
            case 'b'  => out += 0x08; i += 1
            case 'f'  => out += 0x0C; i += 1
            case 'n'  => out += '\n'; i += 1
            case 'r'  => out += '\r'; i += 1
            case 't'  => out += '\t'; i += 1
            case 'v'  => out += 0x0B; i += 1
            case '\\' => out += '\\'; i += 1
            case 'x' =>
              val end = math.min(i + 3, input.length)
              var hexEnd = i + 1
              while (hexEnd < end && isHexDigit(input(hexEnd))) hexEnd += 1
              if (hexEnd > i + 1) {
                val hex = new String(input, i + 1, hexEnd - (i + 1), StandardCharsets.US_ASCII)
                out += java.lang.Integer.parseInt(hex, 16).toByte
                i = hexEnd
              } else { out += 'x'; i += 1 }
            case o if o >= '0' && o <= '7' =>
              val start = i
              val end = math.min(i + 3, input.length)
              var octEnd = start
              while (octEnd < end && input(octEnd) >= '0' && input(octEnd) <= '7') octEnd += 1
              val oct = new String(input, start, octEnd - start, StandardCharsets.US_ASCII)
              // 3 octal digits can exceed one byte (\777); match the
              // reference, which takes the low 8 bits via u8 parse failure →
              // fall back to pushing the digit itself.
              val v = java.lang.Integer.parseInt(oct, 8)
              if (v <= 0xFF) { out += v.toByte; i = octEnd }
              else { out += input(i); i += 1 }
            case other => out += other; i += 1
          }
        }
      }
    }
    new String(out.toArray, StandardCharsets.UTF_8)
  }

  private def isHexDigit(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')

  private val NullSentinel: Array[Byte] = Array('\\', 'N')

  /** Stateful incremental parser. Feed chunks; collect complete rows.
    * Each row is a vector of fields, None = SQL NULL.
    */
  final class Parser extends Serializable {
    private var currentWord = new ArrayBuffer[Byte]()
    private var currentRow = new ArrayBuffer[Option[String]]()
    private var previousWasEscape = false

    private def finalizeField(): Option[String] = {
      val isNull = currentWord.length == 2 &&
        currentWord(0) == NullSentinel(0) && currentWord(1) == NullSentinel(1)
      val res =
        if (isNull) None
        else Some(decodeField(currentWord.toArray))
      currentWord.clear()
      res
    }

    def feed(chunk: Array[Byte]): Vector[Vector[Option[String]]] = {
      val rows = Vector.newBuilder[Vector[Option[String]]]
      var i = 0
      while (i < chunk.length) {
        val byte = chunk(i)
        if (previousWasEscape) {
          currentWord += byte
          previousWasEscape = false
        } else if (byte == '\\') {
          currentWord += byte
          previousWasEscape = true
        } else if (byte == '\t') {
          currentRow += finalizeField()
        } else if (byte == '\n') {
          currentRow += finalizeField()
          rows += currentRow.toVector
          currentRow = new ArrayBuffer[Option[String]]()
        } else {
          currentWord += byte
        }
        i += 1
      }
      rows.result()
    }

    /** Flush a final unterminated row, if any (COPY output is normally
      * newline-terminated, so this is usually empty). */
    def finish(): Option[Vector[Option[String]]] =
      if (currentWord.nonEmpty || currentRow.nonEmpty) {
        currentRow += finalizeField()
        val r = currentRow.toVector
        currentRow = new ArrayBuffer[Option[String]]()
        Some(r)
      } else None
  }

  /** Parse a complete COPY payload in one call. */
  def parseAll(bytes: Array[Byte]): Vector[Vector[Option[String]]] = {
    val p = new Parser
    p.feed(bytes) ++ p.finish()
  }

  /** Encode one field value to COPY text format — inverse of
    * [[decodeField]], for round-trip queries/tests. Escapes the separator
    * and control characters the way PostgreSQL does.
    */
  def encodeField(value: Option[String]): Array[Byte] = value match {
    case None => NullSentinel
    case Some(s) =>
      val bytes = s.getBytes(StandardCharsets.UTF_8)
      val out = new ArrayBuffer[Byte](bytes.length + 8)
      bytes.foreach {
        case '\\' => out += '\\'; out += '\\'
        case '\t' => out += '\\'; out += 't'
        case '\n' => out += '\\'; out += 'n'
        case '\r' => out += '\\'; out += 'r'
        case 0x08 => out += '\\'; out += 'b'
        case 0x0C => out += '\\'; out += 'f'
        case 0x0B => out += '\\'; out += 'v'
        case b    => out += b
      }
      out.toArray
  }

  /** Encode one row (fields + trailing newline). */
  def encodeRow(fields: Seq[Option[String]]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var first = true
    fields.foreach { f =>
      if (!first) out += '\t'
      first = false
      out ++= encodeField(f)
    }
    out += '\n'
    out.toArray
  }
}
