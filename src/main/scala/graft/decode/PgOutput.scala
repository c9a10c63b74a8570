package graft.decode

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** The pgoutput value model: what one column of a decoded tuple can be
  * (reference: `src/adapter/postgres/pgoutput.rs:71-79`).
  */
sealed trait PgValue extends Serializable {
  def isNull: Boolean = this == PgValue.Null

  /** Text payload if this is a Text value, else the given default
    * (reference: `pgoutput.rs:177-182` `text_or`). */
  def textOr(default: String): String = this match {
    case PgValue.Text(v) => v
    case _               => default
  }

  def textOrNull: Option[String] = this match {
    case PgValue.Text(v) => Some(v)
    case _               => None
  }
}

object PgValue {
  case object Unit                   extends PgValue
  case object Null                   extends PgValue
  case object Unchanged              extends PgValue
  case class Text(value: String)     extends PgValue
  case class Binary(bytes: Array[Byte]) extends PgValue
}

/** One decoded pgoutput message
  * (reference: `src/adapter/postgres/pgoutput.rs:62-69`).
  *
  * @param messageType 'I' | 'U' | 'D' | 'T'
  * @param tupleType   'N' for insert/update payloads, 'K'|'O' for delete keys
  * @param payload     new-image columns (key columns for DELETE; empty for TRUNCATE)
  * @param oldValues   before-image when the UPDATE carried a K/O tuple
  */
case class PgOutputMessage(
    messageType: Char,
    relationId: Long,
    tupleType: Option[Char],
    payload: IndexedSeq[PgValue],
    oldValues: Option[IndexedSeq[PgValue]]
)

class PgOutputParseException(msg: String) extends RuntimeException(msg)

/** Binary pgoutput decoder (reference:
  * `src/adapter/postgres/pgoutput.rs:237-554`). A pure function
  * `Array[Byte] => Option[PgOutputMessage]`, usable inside `Dataset.flatMap`
  * on executors — decoding is embarrassingly parallel and never touches the
  * driver.
  *
  * Semantics pinned to the reference:
  *  - `B/C/O/R/Y` messages are skipped (None).
  *  - `I`: relid(u32 BE) + 'N' + tuple.
  *  - `U`: relid + optional ('K'|'O') old tuple + 'N' + new tuple.
  *  - `D`: relid + ('K'|'O') + key tuple (lands in `payload`).
  *  - `T`: u32 relation count (must be ≥ 1) + option byte + first relid.
  *  - Tuple: u16 col count; per column tag 'n'(Null) / 'u'(Unchanged) /
  *    't'(len-prefixed UTF-8 text) / 'b'(len-prefixed binary).
  *  - TOAST: 'u' columns are resolved from the old tuple at decode time;
  *    if no old value exists they become Null
  *    (reference: `pgoutput.rs:517-551`).
  *  - Unknown message type or column tag → exception (fail-fast, the
  *    reference aborts: `src/pipes/postgres.rs:300-313`).
  */
object PgOutputDecoder {

  def decode(bytes: Array[Byte]): Option[PgOutputMessage] = {
    if (bytes.isEmpty) throw new PgOutputParseException("empty pgoutput message")
    (bytes(0): @unchecked) match {
      case 'B' | 'C' | 'O' | 'R' | 'Y' => None
      case 'I' | 'U' | 'D' | 'T'       => Some(decodeWrite(bytes))
      case other =>
        throw new PgOutputParseException(s"Unknown message type: $other")
    }
  }

  private def decodeWrite(bytes: Array[Byte]): PgOutputMessage = {
    val buf = ByteBuffer.wrap(bytes, 1, bytes.length - 1).order(ByteOrder.BIG_ENDIAN)
    val messageType = bytes(0).toChar

    def u32(): Long = {
      require(buf.remaining >= 4, s"pgoutput truncated reading u32 in '$messageType'")
      buf.getInt.toLong & 0xFFFFFFFFL
    }
    def u16(): Int = {
      require(buf.remaining >= 2, s"pgoutput truncated reading u16 in '$messageType'")
      buf.getShort.toInt & 0xFFFF
    }
    def u8(): Int = {
      require(buf.remaining >= 1, s"pgoutput truncated reading u8 in '$messageType'")
      buf.get.toInt & 0xFF
    }

    def readTuple(): IndexedSeq[PgValue] = {
      val n = u16()
      (0 until n).map { _ =>
        u8().toChar match {
          case 'n' => PgValue.Null
          case 'u' => PgValue.Unchanged
          case 't' =>
            val len = u32().toInt
            val arr = new Array[Byte](len)
            buf.get(arr)
            PgValue.Text(new String(arr, StandardCharsets.UTF_8))
          case 'b' =>
            val len = u32().toInt
            val arr = new Array[Byte](len)
            buf.get(arr)
            PgValue.Binary(arr)
          case other =>
            throw new PgOutputParseException(s"Unknown column type: $other")
        }
      }
    }

    def tupleTypeByte(): Char = {
      val c = u8().toChar
      if (c != 'N' && c != 'K' && c != 'O')
        throw new PgOutputParseException(s"Unknown tuple type: $c")
      c
    }

    messageType match {
      case 'I' =>
        val relId = u32()
        val tt = tupleTypeByte()
        val payload = readTuple()
        resolveToast(PgOutputMessage('I', relId, Some(tt), payload, None))
      case 'U' =>
        val relId = u32()
        val tt = tupleTypeByte()
        if (tt == 'K' || tt == 'O') {
          val old = readTuple()
          val newTt = tupleTypeByte()
          if (newTt != 'N')
            throw new PgOutputParseException(
              s"Expected 'N' tuple after old tuple in UPDATE, got: $newTt")
          val payload = readTuple()
          resolveToast(PgOutputMessage('U', relId, Some('N'), payload, Some(old)))
        } else {
          val payload = readTuple()
          resolveToast(PgOutputMessage('U', relId, Some(tt), payload, None))
        }
      case 'D' =>
        val relId = u32()
        val tt = tupleTypeByte()
        val payload = readTuple()
        resolveToast(PgOutputMessage('D', relId, Some(tt), payload, None))
      case 'T' =>
        val nRel = u32()
        if (nRel == 0)
          throw new PgOutputParseException("Truncate message with zero relations is invalid")
        u8() // option byte
        val relId = u32()
        PgOutputMessage('T', relId, None, IndexedSeq.empty, None)
    }
  }

  /** TOAST fallback: Unchanged columns take the old tuple's value at the
    * same index; missing old value (or no old tuple) → Null
    * (reference: `pgoutput.rs:517-551`).
    */
  private[decode] def resolveToast(msg: PgOutputMessage): PgOutputMessage = {
    if (!msg.payload.contains(PgValue.Unchanged)) return msg
    val resolved = msg.oldValues match {
      case Some(old) =>
        msg.payload.zipWithIndex.map {
          case (PgValue.Unchanged, i) => old.lift(i).getOrElse(PgValue.Null)
          case (v, _)                 => v
        }
      case None =>
        msg.payload.map {
          case PgValue.Unchanged => PgValue.Null
          case v                 => v
        }
    }
    msg.copy(payload = resolved)
  }
}

/** Encoder for pgoutput frames — the inverse of [[PgOutputDecoder]].
  *
  * Not part of the reference (which only consumes frames); used by our
  * round-trip correctness queries and property tests: encode a row on an
  * executor, decode it back, and require the original row.
  */
object PgOutputEncoder {

  private def writeTuple(out: java.io.ByteArrayOutputStream, values: Seq[PgValue]): Unit = {
    val b = ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(values.size.toShort)
    out.write(b.array())
    values.foreach {
      case PgValue.Null      => out.write('n')
      case PgValue.Unchanged => out.write('u')
      case PgValue.Unit      => out.write('n') // Unit never appears on the wire
      case PgValue.Text(v) =>
        out.write('t')
        val bytes = v.getBytes(StandardCharsets.UTF_8)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(bytes.length).array())
        out.write(bytes, 0, bytes.length)
      case PgValue.Binary(bytes) =>
        out.write('b')
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(bytes.length).array())
        out.write(bytes, 0, bytes.length)
    }
  }

  private def relId(out: java.io.ByteArrayOutputStream, id: Long): Unit =
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(id.toInt).array())

  def insert(relationId: Long, values: Seq[PgValue]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); relId(out, relationId); out.write('N'); writeTuple(out, values)
    out.toByteArray
  }

  def update(relationId: Long, values: Seq[PgValue], old: Option[Seq[PgValue]] = None,
             oldKind: Char = 'O'): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('U'); relId(out, relationId)
    old.foreach { o => out.write(oldKind); writeTuple(out, o) }
    out.write('N'); writeTuple(out, values)
    out.toByteArray
  }

  def delete(relationId: Long, key: Seq[PgValue], kind: Char = 'K'): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('D'); relId(out, relationId); out.write(kind); writeTuple(out, key)
    out.toByteArray
  }

  def truncate(relationIds: Seq[Long], option: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('T')
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(relationIds.size).array())
    out.write(option)
    relationIds.foreach(relId(out, _))
    out.toByteArray
  }

  /** A skipped message (Begin/Commit/...) with arbitrary body. */
  def skipped(kind: Char): Array[Byte] = Array(kind.toByte)
}
