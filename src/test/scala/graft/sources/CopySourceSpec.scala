package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.decode.CopyText
import graft.types.{CHColumn, CHType}

class CopySourceSpec extends AnyFunSuite with SparkTestBase {

  test("chunked COPY stream → typed snapshot frame (S1 live path)") {
    val target = Seq(
      CHColumn("id", CHType.Int64, isPrimaryKey = true),
      CHColumn("name", CHType.CHStr),
      CHColumn("score", CHType.Float64.nullable),
      CHColumn("password", CHType.CHStr.nullable))

    val bytes =
      CopyText.encodeRow(Seq(Some("1"), Some("ann"), Some("1.5"), Some("x"))) ++
        CopyText.encodeRow(Seq(Some("2"), Some("bob"), None, Some("y"))) ++
        CopyText.encodeRow(Seq(Some("3"), Some("cée"), Some("bad"), None))

    // 5-byte chunks: exercises the incremental parser path end-to-end
    val df = CopySource.snapshot(spark, bytes.grouped(5), target,
      maskColumns = Set("password"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "ann"
      && rows(0).getDouble(2) == 1.5 && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(2)) // \N into Nullable stays null
    assert(rows(2).getString(1) == "cée")
    assert(rows(2).getDouble(2) == 0.0) // invalid real -> 0 (P6)
  }
}
