package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.cdc.CdcApply
import graft.decode.{CopyText, PgOutputDecoder, PgOutputEncoder, PgValue}
import graft.ops.CoreOps
import graft.types.{CHColumn, CHType}

/** Cross-layer integration over the reference-shaped fixtures
  * (FIXTURES.md sec B): the B.1 full-type PG table through
  * COPY-text decode → cast planner → aligned typed frame, and B.2-style
  * pgoutput binary frames through decode → route → batch apply → final
  * state. These pin that the layers compose, not just that each passes
  * its own spec.
  */
class ReferenceFixtureSpec extends AnyFunSuite with SparkTestBase {

  test("B.1 pg_user_table: COPY bytes → parse → cast/align → typed rows") {
    import spark.implicits._

    // target schema per FIXTURES.md B.1 (subset covering every branch)
    val target = Seq(
      CHColumn("id", CHType.Int64, isPrimaryKey = true),
      CHColumn("small", CHType.Int16.nullable),
      CHColumn("ratio", CHType.Float32.nullable),
      CHColumn("price", CHType.CHDecimal.nullable),
      CHColumn("name", CHType.CHStr),
      CHColumn("active", CHType.Bool),
      CHColumn("created_at", CHType.CHDateTime()),
      CHColumn("birth_date", CHType.CHDate.nullable),
      CHColumn("tags", CHType.CHStr.array),
      CHColumn("scores", CHType.Int32.array),
      CHColumn("mystery", CHType.CHStr.nullable),
      CHColumn("password", CHType.CHStr.nullable))

    // two COPY rows: normal + every edge case (null sentinel, escapes,
    // fractional+tz timestamp, invalid numeric → 0, quoted array element)
    // encodeRow escapes specials, so values round-trip verbatim — the
    // multi-byte value exercises UTF-8 split across the 7-byte chunks;
    // raw hex/octal escape decoding is pinned separately in CopyTextSpec.
    val row1 = Seq(Some("1"), Some("42"), Some("1.5"), Some("9.25"),
      Some("café"), Some("t"), Some("2025-08-18 05:16:08.490845+00"),
      Some("2020-03-09"), Some("{\"a,b\",\"c\"}"), Some("{1,2,3}"),
      Some("550e8400-e29b-41d4-a716-446655440000"), Some("hunter2"))
    val row2 = Seq(Some("2"), None, Some("not-a-number"), None,
      Some("tab\there"), Some("f"), Some("2025-08-17 22:00:00+00"),
      None, Some("{x}"), Some("{}"), None, None)
    val copyBytes = CopyText.encodeRow(row1) ++ CopyText.encodeRow(row2)

    // feed in 7-byte chunks to exercise cross-chunk escape/UTF-8 state
    val parser = new CopyText.Parser
    val rows = (copyBytes.grouped(7).flatMap(parser.feed) ++ parser.finish()).toVector
    assert(rows.length == 2)
    assert(rows(0)(4).contains("café"))

    // text rows → DataFrame of strings → cast to target types
    val names = target.map(_.name)
    val textDf = rows.map(r => r.map(_.orNull)).map {
      v => (v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8), v(9), v(10), v(11))
    }.toDF(names: _*)
    val typed = textDf.select(target.map(c =>
      CoreOps.castTextToTarget(
        when(lit(c.name == "password"), lit(null)).otherwise(col(c.name)), // P2 mask
        c.chType).as(c.name)): _*)

    val out = typed.orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getLong(0) == 1L)
    assert(r1.getShort(1) == 42)
    assert(r1.getFloat(2) == 1.5f)
    assert(r1.getDecimal(3).compareTo(new java.math.BigDecimal("9.25")) == 0)
    assert(r1.getString(4) == "café")
    assert(r1.getBoolean(5))
    assert(r1.getTimestamp(6).toString == "2025-08-18 05:16:08.0") // P9 truncation
    assert(r1.getDate(7).toString == "2020-03-09")
    assert(r1.getSeq[String](8) == Seq("a,b", "c")) // P11 quoted element
    assert(r1.getSeq[Int](9) == Seq(1, 2, 3))
    assert(r1.getString(10) == "550e8400-e29b-41d4-a716-446655440000")
    assert(r1.isNullAt(11)) // masked

    val r2 = out(1)
    assert(r2.isNullAt(1)) // \N into Nullable stays null
    assert(r2.getFloat(2) == 0.0f) // P6: invalid real → 0, not null
    assert(r2.isNullAt(3))
    assert(r2.getString(4) == "tab\there")
    assert(!r2.getBoolean(5))
    assert(r2.getSeq[String](8) == Seq("x"))
  }

  test("B.2/B.4 pgoutput frames: decode → route → apply → final state") {
    import spark.implicits._
    val rel = 77L
    def txt(s: String) = PgValue.Text(s)

    // WAL: insert k1, update k1 (TOAST v from before-image), insert k2,
    // delete k2 later in the SAME batch (delete wins), skipped messages
    val wal: Seq[Array[Byte]] = Seq(
      PgOutputEncoder.skipped('B'),
      PgOutputEncoder.insert(rel, Seq(txt("1"), txt("a"))),
      PgOutputEncoder.update(rel,
        Seq(txt("1"), PgValue.Unchanged),
        old = Some(Seq(txt("1"), txt("a-old"))), oldKind = 'O'),
      PgOutputEncoder.insert(rel, Seq(txt("2"), txt("b"))),
      PgOutputEncoder.delete(rel, Seq(txt("2"), PgValue.Null)),
      PgOutputEncoder.skipped('C'))

    // decode (flatMap-style), stamp seq by WAL position
    val records = wal.flatMap(PgOutputDecoder.decode).zipWithIndex.map {
      case (m, i) =>
        val op = m.messageType.toString
        val id = m.payload.head.textOr("?").toLong
        val v = if (m.messageType == 'D') null
          else m.payload(1).textOrNull.orNull // TOAST already resolved
        (op.replace("I", "I").replace("U", "U").replace("D", "D"), i.toLong + 1, id, v)
    }
    assert(records.length == 4) // B/C skipped
    // TOAST: the update's unchanged column came from the before-image
    assert(records(1)._4 == "a-old")

    val changelog = records.toDF("op", "seq", "id", "v")
    val state = CdcApply.finalStateDeclarative(
      changelog, Seq("id"), Seq("v"), batchSize = 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // k1 survives with the TOAST-resolved update; k2 deleted in-batch
    assert(state == Map(1L -> "a-old"))
  }

  test("B.4 truncate-at-routing: prior batches wiped, own batch's queued upserts survive") {
    import spark.implicits._
    val changelog = Seq(
      ("I", 1L, 1L, "a"),
      ("T", 2L, 0L, null),
      ("I", 3L, 2L, "b")
    ).toDF("op", "seq", "id", "v")

    // all in ONE batch: truncate executes at routing, the batch's queued
    // upserts (even ones earlier in the log) are applied AFTER the wipe —
    // the reference's routing/writing split (pipes/postgres.rs:391-417)
    val oneBatch = CdcApply.finalStateDeclarative(changelog, Seq("id"), Seq("v"), 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(oneBatch == Map(1L -> "a", 2L -> "b"))

    // one event per batch: the insert of an EARLIER batch is wiped
    val perBatch = CdcApply.finalStateDeclarative(changelog, Seq("id"), Seq("v"), 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(perBatch == Map(2L -> "b"))
  }
}
