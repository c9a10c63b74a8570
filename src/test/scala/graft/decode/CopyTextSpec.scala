package graft.decode

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropCheck

/** COPY text parser tests mirroring the reference's own unit tests
  * (reference: `src/adapter/postgres.rs:913-1098`): escape decoding, the
  * `\N` sentinel, and chunk-boundary invariance for both escape state and
  * split UTF-8 sequences.
  */
class CopyTextSpec extends AnyFunSuite {

  private def field(s: String): String =
    CopyText.decodeField(s.getBytes(StandardCharsets.UTF_8))

  test("C-style escapes decode (postgres.rs:992-1010)") {
    assert(field("a\\tb") == "a\tb")
    assert(field("a\\nb") == "a\nb")
    assert(field("a\\rb") == "a\rb")
    assert(field("a\\\\b") == "a\\b")
    assert(field("a\\bb") == "a\u0008b")
    assert(field("a\\fb") == "a\u000cb")
    assert(field("a\\vb") == "a\u000bb")
  }

  test("hex escapes: 1 and 2 digits; invalid hex keeps literal x") {
    assert(field("\\x41") == "A")
    assert(field("\\x9") == "\t")
    assert(field("\\xZZ") == "xZZ")
    // UTF-8 é as two hex-escaped bytes reassembles (postgres.rs:1042-1053)
    assert(field("\\xC3\\xA9") == "é")
  }

  test("octal escapes: 1-3 digits; UTF-8 from octal bytes") {
    assert(field("\\101") == "A")
    assert(field("\\11") == "\t")
    assert(field("\\303\\251") == "é")
  }

  test("backslash before other byte yields that byte; trailing backslash kept") {
    assert(field("\\q") == "q")
    assert(field("abc\\") == "abc\\")
  }

  test("\\N sentinel is NULL only as the whole field") {
    val rows = CopyText.parseAll("\\N\ta\\Nb\n".getBytes(StandardCharsets.UTF_8))
    assert(rows == Vector(Vector(None, Some("aNb"))))
  }

  test("rows split on tab and newline") {
    val rows = CopyText.parseAll("1\talpha\n2\tbeta\n".getBytes(StandardCharsets.UTF_8))
    assert(rows == Vector(Vector(Some("1"), Some("alpha")), Vector(Some("2"), Some("beta"))))
  }

  test("escape state carries across chunk boundaries (postgres.rs:1067-1081)") {
    val p = new CopyText.Parser
    // "a\" + "tb\n" — the \t must NOT split the field
    val r1 = p.feed("a\\".getBytes(StandardCharsets.UTF_8))
    val r2 = p.feed("tb\n".getBytes(StandardCharsets.UTF_8))
    assert(r1.isEmpty)
    assert(r2 == Vector(Vector(Some("a\tb"))))
  }

  test("UTF-8 split across chunk boundaries reassembles (postgres.rs:1083-1097)") {
    val bytes = "é1\n".getBytes(StandardCharsets.UTF_8)
    val p = new CopyText.Parser
    val r1 = p.feed(bytes.take(1)) // first byte of é
    val r2 = p.feed(bytes.drop(1))
    assert(r1.isEmpty)
    assert(r2 == Vector(Vector(Some("é1"))))
  }

  test("property: encodeRow→parse round-trips any row at any chunk split") {
    val genField: Gen[Option[String]] = Gen.option(
      Gen.listOf(Gen.oneOf('a', 'é', '\t', '\n', '\\', '"', '漢', ' ')).map(_.mkString))
    PropCheck.check(Prop.forAll(Gen.nonEmptyListOf(genField), Gen.chooseNum(0, 64)) {
      (fields: List[Option[String]], splitAt: Int) =>
        val bytes = CopyText.encodeRow(fields)
        val cut = math.min(splitAt, bytes.length)
        val p = new CopyText.Parser
        val rows = p.feed(bytes.take(cut)) ++ p.feed(bytes.drop(cut)) ++ p.finish()
        rows == Vector(fields.toVector)
    })
  }
}
