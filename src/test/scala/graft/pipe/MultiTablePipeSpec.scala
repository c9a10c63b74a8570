package graft.pipe

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.types.{CHColumn, CHType}

/** A3 per-table routing over a two-table changelog: slices land in their
  * own sinks, unknown tables are skipped, counters observed, masking
  * applied per table. */
class MultiTablePipeSpec extends AnyFunSuite with SparkTestBase {

  test("two-table changelog routes, masks, counts; unknown table skipped") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-multi").toString

    val changelog = Seq(
      // (op, seq, table, id, v, secret)
      ("I", 1L, "users", 1L, 10.0, "a"),
      ("I", 2L, "orders", 1L, 5.0, "b"),
      ("U", 3L, "users", 1L, 20.0, "c"),
      ("D", 4L, "orders", 1L, 0.0, null),
      ("I", 5L, "ghosts", 9L, 9.9, "x"), // unknown table
      ("I", 6L, "orders", 2L, 7.0, "d")
    ).toDF("op", "seq", "table", "id", "v", "secret")

    def spec(name: String, mask: Set[String] = Set.empty) = TableSpec(
      Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("v", CHType.Float64.nullable),
        CHColumn("secret", CHType.CHStr.nullable)),
      new ParquetStateSink(s"$tmp/$name", Seq("id"), Seq("v", "secret"))(spark),
      mask)

    val tables = Map("users" -> spec("users", mask = Set("secret")),
      "orders" -> spec("orders"))
    val pipe = new MultiTablePipe(
      PipeConfig(SourceConfig("parquet"), TargetConfig("parquet"),
        peek_changes_limit = Some(3L)),
      new ChangelogReplaySource(changelog),
      tables, new FileOffsetStore(s"$tmp/offset"))

    val applied = pipe.syncLoop()
    assert(applied == 6L)

    val users = tables("users").sink.asInstanceOf[ParquetStateSink].read()
      .select("id", "v", "secret").collect()
    assert(users.length == 1)
    assert(users.head.getLong(0) == 1L && users.head.getDouble(1) == 20.0)
    assert(users.head.isNullAt(2)) // masked

    val orders = tables("orders").sink.asInstanceOf[ParquetStateSink].read()
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(orders == Map(2L -> 7.0)) // order 1 deleted, order 2 present

    // counters observed for the final batch
    assert(pipe.lastCounters.nonEmpty)
  }
}
