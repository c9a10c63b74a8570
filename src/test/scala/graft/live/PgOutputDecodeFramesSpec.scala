package graft.live

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.decode.{PgOutputEncoder, PgValue}

/** The live pgoutput path's distributed decode: binary frames (built with
  * the same encoder the decoder round-trip specs use) → changelog rows →
  * per-table routed slices. This is what runs on executors between the
  * slot peek and the sink. */
class PgOutputDecodeFramesSpec extends AnyFunSuite with SparkTestBase {

  private val relUsers = PgRelation(101L, "users", Seq("id", "name"))
  private val relOrders = PgRelation(102L, "orders", Seq("id", "total"))

  private def framesDf(frames: Seq[Array[Byte]]) = {
    import spark.implicits._
    frames.zipWithIndex.map { case (b, i) => (i.toLong + 1, b) }
      .toDF("seq", "data")
  }

  test("decodeFrames: inserts/updates/deletes route; B/C/R frames skip; unknown relation drops") {
    val frames = Seq(
      Array[Byte]('B', 0, 0, 0, 0),                       // Begin → skipped
      PgOutputEncoder.insert(101L, Seq(PgValue.Text("1"), PgValue.Text("ada"))),
      PgOutputEncoder.insert(102L, Seq(PgValue.Text("10"), PgValue.Text("99.5"))),
      PgOutputEncoder.update(101L,
        Seq(PgValue.Text("1"), PgValue.Text("ada l."))),
      PgOutputEncoder.delete(102L, Seq(PgValue.Text("10"), PgValue.Null)),
      PgOutputEncoder.insert(999L, Seq(PgValue.Text("zz"))), // unknown rel → dropped
      Array[Byte]('C', 0, 0, 0, 0)                        // Commit → skipped
    )
    val decoded = PgOutputJdbcSource.decodeFrames(
      framesDf(frames), Seq(relUsers, relOrders))
    val rows = decoded.orderBy("seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getSeq[String](3)))
    assert(rows.toSeq == Seq(
      (2L, "I", "users", Seq("1", "ada")),
      (3L, "I", "orders", Seq("10", "99.5")),
      (4L, "U", "users", Seq("1", "ada l.")),
      (5L, "D", "orders", Seq("10", null))))
  }

  test("tableSlice + multiTableSlices: positional cols become named, every table survives") {
    val frames = Seq(
      PgOutputEncoder.insert(101L, Seq(PgValue.Text("1"), PgValue.Text("ada"))),
      PgOutputEncoder.insert(102L, Seq(PgValue.Text("10"), PgValue.Text("99.5"))))
    val decoded = PgOutputJdbcSource.decodeFrames(
      framesDf(frames), Seq(relUsers, relOrders))

    val users = PgOutputJdbcSource.tableSlice(decoded, relUsers).collect()
    assert(users.length == 1)
    assert(users.head.getString(2) == "1" && users.head.getString(3) == "ada")

    val routed = PgOutputJdbcSource.multiTableSlices(decoded, Seq(relUsers, relOrders))
    assert(routed.count() == 2)
    assert(routed.filter(col("table") === "orders")
      .select("total").collect().head.getString(0) == "99.5")
  }

  test("TOAST Unchanged resolves from the old tuple during the distributed decode") {
    val frames = Seq(
      PgOutputEncoder.update(101L,
        Seq(PgValue.Text("1"), PgValue.Unchanged),           // name TOASTed
        old = Some(Seq(PgValue.Text("1"), PgValue.Text("big-old-value"))),
        oldKind = 'O'))
    val decoded = PgOutputJdbcSource.decodeFrames(framesDf(frames), Seq(relUsers))
    val r = decoded.collect().head
    assert(r.getString(1) == "U")
    assert(r.getSeq[String](3) == Seq("1", "big-old-value"))
  }

  test("truncate frames route as T with all-null columns") {
    val frames = Seq(PgOutputEncoder.truncate(Seq(101L)))
    val decoded = PgOutputJdbcSource.decodeFrames(framesDf(frames), Seq(relUsers))
    val r = decoded.collect().head
    assert(r.getString(1) == "T")
    assert(r.getSeq[String](3) == Seq(null, null))
  }
}
