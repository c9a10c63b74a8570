package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.types.{CHColumn, CHType}

/** The live-sink seam end-to-end with a collecting executor: statement
  * kinds, reference write order (truncate → inserts → deletes), in-batch
  * dedup, masking. */
case class Ch(op: String, seq: Long, id: Long, v: String)

class StatementSinkSpec extends AnyFunSuite with SparkTestBase {

  private val cols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true),
    CHColumn("v", CHType.CHStr.nullable),
    CHColumn("secret", CHType.CHStr.nullable))

  test("streaming foreachBatch drives the statement sink per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // appends happen on the stream-execution thread, asserts on this one:
    // synchronize the append itself (not just the lambda construction)
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val sink = new StatementSink("db", "t",
      cols.filterNot(_.name == "secret"),
      (s: String) => executed.synchronized { executed += s })(spark)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ch]
    // AvailableNow snapshots the data available AT START — add first
    input.addData(Ch("I", 1, 1, "a"), Ch("D", 2, 2, null))
    val q = graft.streaming.StreamingCdc.statementWriter(
      input.toDF(), sink, java.nio.file.Files.createTempDirectory("graft-stw").toString)
      .start()
    q.processAllAvailable(); q.stop()

    executed.synchronized {
      assert(executed.exists(_.startsWith("INSERT INTO db.t")), s"got: $executed")
      assert(executed.exists(_.startsWith("ALTER TABLE db.t DELETE WHERE (id = 2)")), s"got: $executed")
    }
  }

  test("batch applies as truncate → deduped inserts → deletes; masked col NULL") {
    import spark.implicits._
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val sink = new StatementSink("db", "t", cols, executed += _,
      maskColumns = Set("secret"))(spark)

    sink.createTable()
    assert(executed.head.startsWith("CREATE TABLE db.t"))
    executed.clear()

    val batch = Seq(
      ("I", 1L, 1L, "a", "s1"),
      ("T", 2L, 0L, null, null),
      ("U", 3L, 1L, "b", "s2"), // same key: last-wins dedup keeps this
      ("I", 4L, 2L, "c", "s3"),
      ("D", 5L, 2L, null, null)
    ).toDF("op", "seq", "id", "v", "secret")

    val (ins, dels, truncated) = sink.applyBatch(batch)
    assert((ins, dels, truncated) == (2L, 1L, true))

    // order: TRUNCATE first, INSERTs, DELETE last
    assert(executed.head == "TRUNCATE TABLE db.t")
    assert(executed.last.startsWith("ALTER TABLE db.t DELETE WHERE (id = 2)"))
    val inserts = executed.filter(_.startsWith("INSERT"))
    assert(inserts.nonEmpty)
    val allInserts = inserts.mkString("\n")
    // dedup: key 1 landed once, with the seq-3 value
    assert(!allInserts.contains("'a'") && allInserts.contains("'b'"))
    assert(allInserts.contains("'c'"))
    // masking: secret rendered NULL everywhere
    assert(!allInserts.contains("s1") && !allInserts.contains("s2") && !allInserts.contains("s3"))
    assert(allInserts.contains("NULL"))
  }
}
