package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.types.{CHColumn, CHType}

class ClickHouseSqlSpec extends AnyFunSuite with SparkTestBase {

  private val cols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true),
    CHColumn("name", CHType.CHStr.nullable),
    CHColumn("active", CHType.Bool),
    CHColumn("score", CHType.Float64.nullable),
    CHColumn("created", CHType.CHDateTime().nullable),
    CHColumn("tags", CHType.CHStr.array))

  private def df(rows: Seq[(Long, String, Boolean, Option[Double], java.sql.Timestamp, Seq[String])]) = {
    import spark.implicits._
    rows.toDF("id", "name", "active", "score", "created", "tags")
  }

  test("insert format matches the reference byte-for-byte") {
    val d = df(Seq(
      (1L, "o'neil\\x", true, Some(1.5), java.sql.Timestamp.valueOf("2025-08-18 05:16:08.49"), Seq("a", "b")),
      (2L, null, false, None, null, Seq.empty)))
    val got = ClickHouseSql.insertQuery("benchmark", "users", cols, d.collect().toSeq)
    assert(got ==
      "INSERT INTO benchmark.users (id, name, active, score, created, tags) " +
        "VALUES(1,'o''neil\\\\x',TRUE,1.5,toDateTime('2025-08-18 05:16:08'),['a', 'b'])," +
        " (2,NULL,FALSE,NULL,NULL,[])")
  }

  test("masked column renders NULL; null into non-nullable renders default") {
    val d = df(Seq((1L, "x", true, Some(2.0), null, Seq.empty)))
    val got = ClickHouseSql.insertQuery("db", "t", cols, d.collect().toSeq,
      maskColumns = Set("name"))
    assert(got.contains("(1,NULL,TRUE,2"))
    // non-nullable bool/int defaults
    val noVals = ClickHouseSql.renderValue(null, CHType.Bool)
    assert(noVals == "FALSE")
    assert(ClickHouseSql.renderValue(null, CHType.Int32) == "0")
    assert(ClickHouseSql.renderValue(null, CHType.CHStr) == "''")
  }

  test("delete format: PK conjunction per row, OR-joined") {
    val d = df(Seq(
      (1L, "a", true, None, null, Seq.empty),
      (7L, "b", false, None, null, Seq.empty)))
    val got = ClickHouseSql.deleteQuery("db", "t", cols, d.collect().toSeq)
    assert(got == "ALTER TABLE db.t DELETE WHERE (id = 1) OR (id = 7)")
  }

  test("property: escaped strings never leak an unescaped quote") {
    import org.scalacheck.{Gen, Prop}
    graft.PropCheck.check(Prop.forAll(Gen.asciiPrintableStr) { (s: String) =>
      val esc = ClickHouseSql.escapeString(s)
      // every quote in the escaped output is doubled: rendering '<esc>'
      // can never terminate the literal early
      !("(^|[^'])'([^']|$)".r.findFirstIn(esc.replace("''", "")).isDefined)
    })
    // the reference's own order: quotes first, then backslashes
    assert(ClickHouseSql.escapeString("""a'b\c""") == """a''b\\c""")
    assert(ClickHouseSql.escapeString("line1\nline2") == "line1\\nline2")
  }

  test("Time values render quoted in both dialects (bare 05:16:08 is malformed SQL)") {
    // Time maps to Spark StringType, so the raw value is a String
    assert(ClickHouseSql.renderValue("05:16:08", CHType.CHTime) == "'05:16:08'")
    assert(ClickHouseSql.renderValue("05:16:08.123456", CHType.Time64(6)) == "'05:16:08.123456'")
    assert(ClickHouseSql.renderValue(null, CHType.CHTime) == "'00:00:00'")
    assert(ClickHouseSql.renderValue(null, CHType.CHTime.nullable) == "NULL")
    assert(AnsiDialect.renderValue("05:16:08", CHType.CHTime) == "TIME '05:16:08'")
    assert(AnsiDialect.renderValue(null, CHType.CHTime) == "TIME '00:00:00'")
    assert(AnsiDialect.renderValue(null, CHType.Time64(3).nullable) == "NULL")
  }

  test("deleteQuery refuses a table with no primary-key columns") {
    val noPk = Seq(CHColumn("name", CHType.CHStr))
    import spark.implicits._
    val rows = Seq(Tuple1("a")).toDF("name").collect().toSeq
    intercept[IllegalArgumentException] {
      ClickHouseSql.deleteQuery("db", "t", noPk, rows)
    }
    intercept[IllegalArgumentException] {
      AnsiDialect.deleteQuery("db", "t", noPk, rows)
    }
  }

  test("distributed statement generation respects batch size") {
    import spark.implicits._
    val d = (1 to 10).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val stmts = ClickHouseSql.insertStatements(
      d.repartition(2), "db", "t",
      Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("name", CHType.CHStr.nullable)),
      batchSize = 3).collect()
    assert(stmts.length >= 4) // 2 partitions x ceil(5/3)
    assert(stmts.forall(_.startsWith("INSERT INTO db.t (id, name) VALUES(")))
    val totalRows = stmts.map(_.count(_ == '(') - 1).sum // header parens
    assert(totalRows == 10)
  }
}
