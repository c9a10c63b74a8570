package graft.pipe

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.Changelog
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.types.{CHColumn, CHType}

/** Percent progress for the bulk copy (reference: `src/logger.rs:25-46`):
  * monotone percent lines, task-metric driven, ends at 100%. */
class ProgressSpec extends AnyFunSuite with SparkTestBase {

  test("ProgressLogger emits monotone percent steps, concurrency-safe") {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val p = new ProgressLogger(1000, lines.synchronized { lines += _ }, "copy t")
    p.add(100); p.add(100); p.add(50); p.add(750)
    val pcts = lines.map(_.split("%")(0).split(" ").last.toInt)
    assert(pcts.toSeq == pcts.sorted, s"not monotone: $lines")
    assert(pcts.last == 100)
    assert(lines.forall(_.startsWith("[copy t]")))
    // over-estimate clamps at 100
    p.add(500)
    assert(p.percent == 100)
  }

  test("firstSync with progress: monotone lines from a multi-partition distributed copy") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val changelog = Changelog.fromEvents(events).cache()
    val snapshot = changelog.filter(org.apache.spark.sql.functions.col("op") === "I")
      .repartition(8) // multi-task write → several task-end contributions
    val tmp = Files.createTempDirectory("graft-progress").toString
    val sink = new ParquetStateSink(s"$tmp/state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val pipe = new Pipe(
      PipeConfig(SourceConfig("parquet"), TargetConfig("parquet")),
      new ChangelogReplaySource(changelog, Some(snapshot)), sink,
      new FileOffsetStore(s"$tmp/offset"),
      Seq(
        CHColumn("user_id", CHType.Int64, isPrimaryKey = true),
        CHColumn("last_ts", CHType.CHDateTime().nullable),
        CHColumn("total_value", CHType.Float64.nullable),
        CHColumn("n_events", CHType.Int64.nullable)),
      tableName = "user_state")

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    assert(pipe.firstSync(progressOut = Some(lines.synchronized { lines += _ })))

    assert(lines.nonEmpty, "no progress lines")
    val pcts = lines.map(_.split("%")(0).split(" ").last.toInt).toSeq
    assert(pcts == pcts.sorted, s"not monotone: $lines")
    assert(pcts.last == 100, s"did not reach 100%: $lines")
    assert(lines.forall(_.startsWith("[copy user_state]")))
    // the copy itself is correct
    assert(sink.read().count() > 0)
  }
}
