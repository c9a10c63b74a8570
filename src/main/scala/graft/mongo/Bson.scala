package graft.mongo

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer
import graft.types.BsonKind

/** Decoded BSON value tree. Covers every element type of the public BSON
  * spec (bsonspec.org, v1.1) that the reference's change-stream decode
  * dispatches on (`/root/reference/src/adapter/mongodb.rs:169-341`,
  * kind mapping `mongodb.rs:522-559`).
  */
sealed trait BsonValue { def kind: BsonKind }
object BsonValue {
  case class BDouble(v: Double) extends BsonValue { def kind = BsonKind.BDouble }
  case class BStr(v: String) extends BsonValue { def kind = BsonKind.BString }
  case class BDoc(fields: Vector[(String, BsonValue)]) extends BsonValue {
    def kind = BsonKind.BDocument
    def get(name: String): Option[BsonValue] = fields.collectFirst { case (`name`, v) => v }
  }
  case class BArr(items: Vector[BsonValue]) extends BsonValue { def kind = BsonKind.BArray }
  case class BBin(subtype: Byte, bytes: Vector[Byte]) extends BsonValue { def kind = BsonKind.BBinary }
  case class BObjId(bytes: Vector[Byte]) extends BsonValue {
    require(bytes.length == 12, "ObjectId is 12 bytes")
    def kind = BsonKind.BObjectId
    def hex: String = bytes.map(b => f"${b & 0xff}%02x").mkString
  }
  case class BBool(v: Boolean) extends BsonValue { def kind = BsonKind.BBoolean }
  case class BDateTime(epochMillis: Long) extends BsonValue { def kind = BsonKind.BDateTime }
  case object BNull extends BsonValue { def kind = BsonKind.BNull }
  case object BUndef extends BsonValue { def kind = BsonKind.BUndefined }
  case class BRegex(pattern: String, options: String) extends BsonValue { def kind = BsonKind.BRegex }
  case class BJsCode(code: String) extends BsonValue { def kind = BsonKind.BJsCode }
  case class BSymbol(v: String) extends BsonValue { def kind = BsonKind.BSymbol }
  case class BInt32(v: Int) extends BsonValue { def kind = BsonKind.BInt32 }
  case class BTimestamp(raw: Long) extends BsonValue { def kind = BsonKind.BTimestamp }
  case class BInt64(v: Long) extends BsonValue { def kind = BsonKind.BInt64 }
  case class BDecimal128(bytes: Vector[Byte]) extends BsonValue {
    require(bytes.length == 16, "decimal128 is 16 bytes")
    def kind = BsonKind.BDecimal128
  }
  case class BDbPointer(ns: String, id: Vector[Byte]) extends BsonValue { def kind = BsonKind.BDbPointer }
  case object BMinKey extends BsonValue { def kind = BsonKind.BMinKey }
  case object BMaxKey extends BsonValue { def kind = BsonKind.BMaxKey }
}

/** Minimal BSON binary codec, little-endian per the public spec. The
  * decoder is the live-Mongo wire seam (change-stream documents arrive as
  * BSON); the encoder exists for fixtures and round-trip properties, the
  * same test pattern PgOutputSpec uses for pgoutput frames.
  */
object Bson {
  import BsonValue._

  // ------------------------------------------------------------- decode

  def decodeDocument(bytes: Array[Byte]): BDoc = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    readDoc(buf)
  }

  private def readDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt()
    val fields = Vector.newBuilder[(String, BsonValue)]
    while (buf.position() < start + len - 1) {
      val tpe = buf.get()
      val name = readCString(buf)
      fields += name -> readValue(tpe, buf)
    }
    require(buf.get() == 0, "document must end with 0x00")
    BDoc(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val out = new ArrayBuffer[Byte]()
    var b = buf.get()
    while (b != 0) { out += b; b = buf.get() }
    new String(out.toArray, "UTF-8")
  }

  private def readString(buf: ByteBuffer): String = {
    val len = buf.getInt() // includes the trailing 0x00
    val arr = new Array[Byte](len - 1)
    buf.get(arr)
    require(buf.get() == 0, "string must end with 0x00")
    new String(arr, "UTF-8")
  }

  private def readBytes(buf: ByteBuffer, n: Int): Vector[Byte] = {
    val arr = new Array[Byte](n)
    buf.get(arr)
    arr.toVector
  }

  private def readValue(tpe: Byte, buf: ByteBuffer): BsonValue = tpe match {
    case 0x01 => BDouble(buf.getDouble())
    case 0x02 => BStr(readString(buf))
    case 0x03 => readDoc(buf)
    case 0x04 => BArr(readDoc(buf).fields.map(_._2))
    case 0x05 =>
      val len = buf.getInt(); val sub = buf.get()
      BBin(sub, readBytes(buf, len))
    case 0x06 => BUndef
    case 0x07 => BObjId(readBytes(buf, 12))
    case 0x08 => BBool(buf.get() != 0)
    case 0x09 => BDateTime(buf.getLong())
    case 0x0A => BNull
    case 0x0B => BRegex(readCString(buf), readCString(buf))
    case 0x0C => BDbPointer(readString(buf), readBytes(buf, 12))
    case 0x0D => BJsCode(readString(buf))
    case 0x0E => BSymbol(readString(buf))
    case 0x0F => // code_w_scope: int32 total, string, doc — keep the code
      buf.getInt(); val code = readString(buf); readDoc(buf); BJsCode(code)
    case 0x10 => BInt32(buf.getInt())
    case 0x11 => BTimestamp(buf.getLong())
    case 0x12 => BInt64(buf.getLong())
    case 0x13 => BDecimal128(readBytes(buf, 16))
    case -1   => BMinKey // 0xFF
    case 0x7F => BMaxKey
    case other => throw new IllegalArgumentException(f"unknown BSON type 0x$other%02x")
  }

  // ------------------------------------------------------------- encode

  def encodeDocument(doc: BDoc): Array[Byte] = {
    val body = new ArrayBuffer[Byte]()
    doc.fields.foreach { case (name, v) =>
      body += typeByte(v)
      body ++= cstring(name)
      body ++= valueBytes(v)
    }
    val total = 4 + body.length + 1
    le32(total) ++ body.toArray :+ 0.toByte
  }

  private def typeByte(v: BsonValue): Byte = v match {
    case _: BDouble => 0x01
    case _: BStr => 0x02
    case _: BDoc => 0x03
    case _: BArr => 0x04
    case _: BBin => 0x05
    case BUndef => 0x06
    case _: BObjId => 0x07
    case _: BBool => 0x08
    case _: BDateTime => 0x09
    case BNull => 0x0A
    case _: BRegex => 0x0B
    case _: BDbPointer => 0x0C
    case _: BJsCode => 0x0D
    case _: BSymbol => 0x0E
    case _: BInt32 => 0x10
    case _: BTimestamp => 0x11
    case _: BInt64 => 0x12
    case _: BDecimal128 => 0x13
    case BMinKey => -1
    case BMaxKey => 0x7F
  }

  private def cstring(s: String): Array[Byte] = s.getBytes("UTF-8") :+ 0.toByte
  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
  private def le64(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
  private def bstring(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    le32(b.length + 1) ++ b :+ 0.toByte
  }

  private def valueBytes(v: BsonValue): Array[Byte] = v match {
    case BDouble(d) =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()
    case BStr(s) => bstring(s)
    case d: BDoc => encodeDocument(d)
    case BArr(items) =>
      encodeDocument(BDoc(items.zipWithIndex.map { case (it, i) => i.toString -> it }))
    case BBin(sub, bytes) => le32(bytes.length) ++ Array(sub) ++ bytes.toArray
    case BUndef => Array.empty
    case BObjId(bytes) => bytes.toArray
    case BBool(b) => Array[Byte](if (b) 1 else 0)
    case BDateTime(ms) => le64(ms)
    case BNull => Array.empty
    case BRegex(p, o) => cstring(p) ++ cstring(o)
    case BDbPointer(ns, id) => bstring(ns) ++ id.toArray
    case BJsCode(c) => bstring(c)
    case BSymbol(s) => bstring(s)
    case BInt32(i) => le32(i)
    case BTimestamp(t) => le64(t)
    case BInt64(l) => le64(l)
    case BDecimal128(bytes) => bytes.toArray
    case BMinKey | BMaxKey => Array.empty
  }

  // ------------------------------------------------------- text render

  /** Scalar text for changelog columns, consistent with [[BsonRender]]'s
    * column rules: ObjectId → lowercase hex, DateTime → UTC seconds text,
    * Binary → base64, Null/Undefined → none
    * (reference: `src/adapter/mongodb.rs:379-441`). */
  def scalarText(v: BsonValue): Option[String] = v match {
    case BsonValue.BNull | BsonValue.BUndef => None
    case BsonValue.BStr(s) => Some(s)
    case BsonValue.BInt32(i) => Some(i.toString)
    case BsonValue.BInt64(l) => Some(l.toString)
    case BsonValue.BDouble(d) => Some(d.toString)
    case BsonValue.BBool(b) => Some(if (b) "true" else "false")
    case o: BsonValue.BObjId => Some(o.hex)
    case BsonValue.BDateTime(ms) =>
      Some(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms)))
    case BsonValue.BBin(_, bytes) =>
      Some(java.util.Base64.getEncoder.encodeToString(bytes.toArray))
    case BsonValue.BTimestamp(raw) => Some((raw >>> 32).toString) // seconds part
    case BsonValue.BSymbol(s) => Some(s)
    case BsonValue.BJsCode(c) => Some(c)
    case other => Some(other.toString) // docs/arrays/regex: debug text
  }
}
