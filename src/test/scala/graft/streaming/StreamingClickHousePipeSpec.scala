package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import graft.SparkTestBase
import graft.chstub.{ChStubEngine, ChStubHttp}
import graft.sinks.{ClickHouseDialect, StatementSink}
import graft.types.{CHColumn, CHType}

/** The reference's CDC loop (EP3, `sync_loop` — `pipes/postgres.rs`) as a
  * CONTINUOUS Structured Streaming query applied to the EXECUTABLE
  * ClickHouse endpoint: micro-batches from the streaming engine, the
  * rendered statements POSTed over real HTTP ([[ChStubHttp]]), state
  * collapsed by the stub's ReplacingMergeTree model. The batch-mode
  * ClickHousePipeSpec pins that each statement kind executes; this spec
  * pins the CONTINUOUS contract on top:
  *
  *  - checkpointed offsets resume across query restarts (stop mid-stream,
  *    start a new query on the same checkpoint, only the new data applies);
  *  - an at-least-once replay (fresh checkpoint over the full input, as
  *    after losing the checkpoint with the target intact) converges to the
  *    IDENTICAL final state — idempotence through the sink's last-wins
  *    dedup + ReplacingMergeTree collapse + delete-after-insert order;
  *  - an endpoint rejection (HTTP 400) FAILS the streaming query rather
  *    than dropping the batch (commit-after-write: offsets only advance
  *    past applied batches).
  */
case class ChEv(op: String, seq: Long, id: Long, v: String)

class StreamingClickHousePipeSpec extends AnyFunSuite with SparkTestBase {

  private val cols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true),
    CHColumn("v", CHType.CHStr.nullable))

  private def finalState(stub: ChStubHttp, table: String): Map[BigDecimal, Any] =
    stub.engine.table("graft", table).finalRows
      .map(r => (r("id").asInstanceOf[BigDecimal], r("v"))).toMap

  test("continuous CDC over HTTP: restart resumes from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      stub.execute(ClickHouseDialect.createTableQuery("graft", "docs", cols))
      val sink = new StatementSink("graft", "docs", cols, stub.execute)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ch").toString

      val input = MemoryStream[ChEv]
      input.addData(ChEv("I", 1, 1, "a"), ChEv("I", 2, 2, "b"))
      val q1 = StreamingCdc.statementWriter(input.toDF(), sink, ckpt).start()
      q1.processAllAvailable(); q1.stop()
      assert(finalState(stub, "docs") ==
        Map(BigDecimal(1) -> "a", BigDecimal(2) -> "b"))
      assert(stub.engine.executed.exists(_.startsWith("INSERT INTO graft.docs")))
      val stmtsAfterFirst = stub.engine.executed.size

      // restart on the SAME checkpoint: only the new events apply
      input.addData(ChEv("U", 3, 1, "a2"), ChEv("D", 4, 2, null),
        ChEv("I", 5, 3, "c"))
      val q2 = StreamingCdc.statementWriter(input.toDF(), sink, ckpt).start()
      q2.processAllAvailable(); q2.stop()
      assert(finalState(stub, "docs") ==
        Map(BigDecimal(1) -> "a2", BigDecimal(3) -> "c"))
      assert(stub.engine.executed.drop(stmtsAfterFirst)
        .exists(_.startsWith("ALTER TABLE graft.docs DELETE WHERE (id = 2)")))

      // at-least-once replay: a FRESH checkpoint re-reads the FULL input
      // (the post-crash worst case: checkpoint lost, target intact). The
      // replay must CONVERGE — same final state, not doubled/corrupted —
      // via in-batch last-wins dedup + Replacing collapse + deletes last.
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-stream-ch2").toString
      val q3 = StreamingCdc.statementWriter(input.toDF(), sink, ckpt2).start()
      q3.processAllAvailable(); q3.stop()
      assert(finalState(stub, "docs") ==
        Map(BigDecimal(1) -> "a2", BigDecimal(3) -> "c"))
    } finally stub.close()
  }

  test("an endpoint rejection fails the query instead of dropping the batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      // no CREATE TABLE: the INSERT hits a missing table → HTTP 400 →
      // the foreachBatch throws → the query fails; offsets do NOT advance
      val sink = new StatementSink("graft", "missing", cols, stub.execute)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-chf").toString
      val input = MemoryStream[ChEv]
      input.addData(ChEv("I", 1, 1, "a"))
      val q = StreamingCdc.statementWriter(input.toDF(), sink, ckpt).start()
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      assert(e.getCause != null)

      // the table appearing (operator fixes the target) + a restart on the
      // SAME checkpoint replays the unacknowledged batch: nothing lost
      stub.execute(ClickHouseDialect.createTableQuery("graft", "missing", cols))
      val q2 = StreamingCdc.statementWriter(input.toDF(), sink, ckpt).start()
      q2.processAllAvailable(); q2.stop()
      assert(finalState(stub, "missing") == Map(BigDecimal(1) -> "a"))
    } finally stub.close()
  }
}
