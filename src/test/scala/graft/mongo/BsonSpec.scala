package graft.mongo

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropCheck
import graft.types.BsonKind

/** BSON binary codec against the public spec (bsonspec.org): the golden
  * example document, per-type decoding, and an encode→decode round-trip
  * property — the same fixture-driven pattern PgOutputSpec uses for
  * pgoutput frames. */
class BsonSpec extends AnyFunSuite {
  import BsonValue._

  test("""golden: {"hello": "world"} is the spec's 22-byte example""") {
    // \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
    val bytes = Array[Byte](0x16, 0, 0, 0, 0x02) ++
      "hello".getBytes("UTF-8") ++ Array[Byte](0) ++
      Array[Byte](0x06, 0, 0, 0) ++ "world".getBytes("UTF-8") ++ Array[Byte](0, 0)
    assert(bytes.length == 0x16)
    val doc = Bson.decodeDocument(bytes)
    assert(doc == BDoc(Vector("hello" -> BStr("world"))))
    assert(Bson.encodeDocument(doc).toSeq == bytes.toSeq)
  }

  test("all scalar types decode with the right kind and value") {
    val oid = BObjId(Vector.tabulate(12)(_.toByte))
    val doc = BDoc(Vector(
      "d" -> BDouble(3.25), "s" -> BStr("täxt"), "i" -> BInt32(-7),
      "l" -> BInt64(1L << 40), "b" -> BBool(true), "n" -> BNull,
      "dt" -> BDateTime(1700000000123L), "oid" -> oid,
      "bin" -> BBin(0, Vector[Byte](1, 2, 3)),
      "ts" -> BTimestamp((5L << 32) | 9L),
      "dec" -> BDecimal128(Vector.fill(16)(0x11.toByte)),
      "re" -> BRegex("^a.*", "i"),
      "arr" -> BArr(Vector(BInt32(1), BStr("two"), BNull)),
      "sub" -> BDoc(Vector("x" -> BInt32(1)))))
    val decoded = Bson.decodeDocument(Bson.encodeDocument(doc))
    assert(decoded == doc)
    assert(decoded.get("oid").get.kind == BsonKind.BObjectId)
    assert(decoded.get("arr").get.kind == BsonKind.BArray)
    assert(decoded.get("dt").get.kind == BsonKind.BDateTime)
  }

  private val genScalar: Gen[BsonValue] = Gen.oneOf(
    Gen.chooseNum(Double.MinValue, Double.MaxValue).map(BDouble),
    Gen.alphaNumStr.map(BStr), // cstrings cannot hold NUL; names/regex likewise
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(BInt32),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(BInt64),
    Gen.oneOf(true, false).map(BBool),
    Gen.const(BNull),
    Gen.chooseNum(-62135596800000L, 253402300799999L).map(BDateTime),
    Gen.listOfN(12, Gen.chooseNum(0, 255).map(_.toByte)).map(l => BObjId(l.toVector)),
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(l => BBin(0, l.toVector)),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(BTimestamp),
    Gen.listOfN(16, Gen.chooseNum(0, 255).map(_.toByte)).map(l => BDecimal128(l.toVector)))

  private val genValue: Gen[BsonValue] = Gen.frequency(
    8 -> genScalar,
    1 -> Gen.listOfN(3, genScalar).map(l => BArr(l.toVector)),
    1 -> Gen.listOfN(2, Gen.zip(Gen.identifier, genScalar))
      .map(l => BDoc(l.toVector)))

  private val genDoc: Gen[BDoc] =
    Gen.listOf(Gen.zip(Gen.identifier, genValue)).map { kvs =>
      // BSON allows duplicate names but our get() is first-wins; keep
      // round-trip comparison simple with distinct names
      BDoc(kvs.distinctBy(_._1).toVector)
    }

  test("property: encode → decode round-trips any document") {
    PropCheck.check(Prop.forAll(genDoc) { doc =>
      Bson.decodeDocument(Bson.encodeDocument(doc)) == doc
    })
  }

  test("scalarText renders by the reference's column rules") {
    assert(Bson.scalarText(BObjId(Vector.tabulate(12)(_.toByte))).contains(
      "000102030405060708090a0b"))
    assert(Bson.scalarText(BDateTime(0L)).contains("1970-01-01 00:00:00"))
    assert(Bson.scalarText(BBin(0, Vector[Byte](1, 2, 3))).contains("AQID"))
    assert(Bson.scalarText(BNull).isEmpty)
    assert(Bson.scalarText(BBool(true)).contains("true"))
    assert(Bson.scalarText(BTimestamp((1234L << 32) | 1L)).contains("1234"))
  }
}
