package graft.decode

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropCheck

/** Decoder fixtures per FIXTURES.md §B.2, pinned to the reference decoder
  * (reference: `src/adapter/postgres/pgoutput.rs:237-554`).
  */
class PgOutputSpec extends AnyFunSuite {

  test("INSERT frame decodes to payload values") {
    val frame = PgOutputEncoder.insert(42L, Seq(PgValue.Text("a"), PgValue.Null, PgValue.Text("b")))
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.messageType == 'I')
    assert(msg.relationId == 42L)
    assert(msg.tupleType.contains('N'))
    assert(msg.payload == IndexedSeq(PgValue.Text("a"), PgValue.Null, PgValue.Text("b")))
    assert(msg.oldValues.isEmpty)
  }

  test("UPDATE without old tuple") {
    val frame = PgOutputEncoder.update(7L, Seq(PgValue.Text("x")))
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.messageType == 'U')
    assert(msg.payload == IndexedSeq(PgValue.Text("x")))
    assert(msg.oldValues.isEmpty)
  }

  test("UPDATE with old tuple keeps before-image") {
    val frame = PgOutputEncoder.update(7L,
      Seq(PgValue.Text("new")), Some(Seq(PgValue.Text("old"))), oldKind = 'O')
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.oldValues.contains(IndexedSeq(PgValue.Text("old"))))
    assert(msg.payload == IndexedSeq(PgValue.Text("new")))
  }

  test("TOAST: Unchanged column filled from old tuple (reference pgoutput.rs:517-530)") {
    val frame = PgOutputEncoder.update(7L,
      Seq(PgValue.Unchanged, PgValue.Text("b2")),
      Some(Seq(PgValue.Text("a1"), PgValue.Text("b1"))), oldKind = 'K')
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.payload == IndexedSeq(PgValue.Text("a1"), PgValue.Text("b2")))
  }

  test("TOAST: Unchanged without old tuple becomes Null (reference pgoutput.rs:532-551)") {
    val frame = PgOutputEncoder.update(7L, Seq(PgValue.Unchanged, PgValue.Text("b")))
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.payload == IndexedSeq(PgValue.Null, PgValue.Text("b")))
  }

  test("DELETE carries key tuple as payload") {
    val frame = PgOutputEncoder.delete(9L, Seq(PgValue.Text("5")), kind = 'K')
    val msg = PgOutputDecoder.decode(frame).get
    assert(msg.messageType == 'D')
    assert(msg.tupleType.contains('K'))
    assert(msg.payload == IndexedSeq(PgValue.Text("5")))
  }

  test("TRUNCATE decodes first relation id; zero relations rejected (pgoutput.rs:425-446)") {
    val msg = PgOutputDecoder.decode(PgOutputEncoder.truncate(Seq(13L, 14L))).get
    assert(msg.messageType == 'T')
    assert(msg.relationId == 13L)
    assertThrows[PgOutputParseException](
      PgOutputDecoder.decode(PgOutputEncoder.truncate(Seq.empty)))
  }

  test("skipped message kinds B/C/O/R/Y decode to None (pgoutput.rs:242-262)") {
    for (k <- Seq('B', 'C', 'O', 'R', 'Y'))
      assert(PgOutputDecoder.decode(PgOutputEncoder.skipped(k)).isEmpty)
  }

  test("unknown message type fails fast (pipes/postgres.rs:300-313)") {
    assertThrows[PgOutputParseException](PgOutputDecoder.decode(Array('Z'.toByte)))
    assertThrows[PgOutputParseException](PgOutputDecoder.decode(Array.empty[Byte]))
  }

  test("unknown column tag fails fast") {
    // I + relid + N + ncols=1 + bad tag 'q'
    val bad = Array[Byte]('I', 0, 0, 0, 1, 'N', 0, 1, 'q')
    assertThrows[PgOutputParseException](PgOutputDecoder.decode(bad))
  }

  test("binary column round-trips") {
    val bytes = Array[Byte](0, 1, 2, -1)
    val msg = PgOutputDecoder.decode(PgOutputEncoder.insert(1L, Seq(PgValue.Binary(bytes)))).get
    assert(msg.payload.head.asInstanceOf[PgValue.Binary].bytes.sameElements(bytes))
  }

  test("relation ids above Int.MaxValue decode unsigned") {
    val rel = 0xFFFFFFF0L
    val msg = PgOutputDecoder.decode(PgOutputEncoder.insert(rel, Seq(PgValue.Null))).get
    assert(msg.relationId == rel)
  }

  private val genValue: Gen[PgValue] = Gen.oneOf(
    Gen.const(PgValue.Null),
    Gen.asciiPrintableStr.map(PgValue.Text(_)),
    // UTF-8 multibyte content
    Gen.listOf(Gen.oneOf('é', '漢', 'a', '☃', '\n', '\t')).map(cs => PgValue.Text(cs.mkString))
  )

  test("property: encode→decode round-trips INSERT tuples") {
    PropCheck.check(Prop.forAll(Gen.listOf(genValue), Gen.chooseNum(1L, 0xFFFFFFFFL)) {
      (vals: List[PgValue], rel: Long) =>
        val msg = PgOutputDecoder.decode(PgOutputEncoder.insert(rel, vals)).get
        msg.relationId == rel && msg.payload == vals.toIndexedSeq
    })
  }

  test("property: UPDATE with old tuple resolves every Unchanged to old value") {
    PropCheck.check(Prop.forAll(Gen.listOfN(4, genValue)) { (old: List[PgValue]) =>
      val news = old.indices.map(i => if (i % 2 == 0) PgValue.Unchanged else PgValue.Text(s"n$i"))
      val msg = PgOutputDecoder.decode(
        PgOutputEncoder.update(1L, news, Some(old))).get
      msg.payload.zipWithIndex.forall { case (v, i) =>
        if (i % 2 == 0) v == old(i) else v == PgValue.Text(s"n$i")
      }
    })
  }
}
