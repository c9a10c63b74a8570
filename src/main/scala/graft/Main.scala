package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.cdc.Changelog
import graft.config.PipeConfig
import graft.pipe.{ChangelogReplaySource, FileOffsetStore, ParquetStateSink, Pipe}
import graft.sources.Tables
import graft.types.{CHColumn, CHType}

/** CLI entry point — the analogue of the reference's only command,
  * `clockpipe run --config-file cfg.json` (reference: `src/main.rs:22-52`,
  * `src/command.rs:3-48`): load JSON config, dispatch on source type, run
  * the pipe lifecycle (initialize → first_sync → sync_loop).
  *
  * Source type `parquet` replays the driver testdata's events table as the
  * CDC stream (the test/bench stand-in for a live pgoutput slot or Mongo
  * change stream); `postgres`/`mongodb` would wire JDBC/change-stream
  * sources behind the same [[graft.pipe.CdcSource]] seam.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.Main run --config-file <cfg.json>"
    args.toList match {
      case "run" :: "--config-file" :: path :: Nil => run(PipeConfig.fromFile(path))
      case _ => System.err.println(usage); sys.exit(2)
    }
  }

  def run(config: PipeConfig): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-pipe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try runWith(spark, config)
    finally spark.stop()
  }

  /** Dispatch by source type (reference: `src/main.rs:38-49`). */
  def runWith(spark: SparkSession, config: PipeConfig): Unit =
    config.source.source_type match {
      case "parquet" => runParquetReplay(spark, config)
      case other =>
        // postgres/mongodb need live endpoints; the pipe seam is the same.
        throw new IllegalArgumentException(
          s"source_type '$other' requires a live endpoint; configure 'parquet' replay")
    }

  private def runParquetReplay(spark: SparkSession, config: PipeConfig): Unit = {
    implicit val s: SparkSession = spark
    val srcDir = config.source.parquet_dir.getOrElse(
      throw new IllegalArgumentException("source.parquet_dir required"))
    val outDir = config.target.parquet_dir.getOrElse(
      throw new IllegalArgumentException("target.parquet_dir required"))

    val changelog = Changelog.fromEvents(Tables.events(spark, srcDir))
    val targetCols = Seq(
      CHColumn("user_id", CHType.Int64, isPrimaryKey = true),
      CHColumn("last_ts", CHType.CHDateTime().nullable),
      CHColumn("total_value", CHType.Float64.nullable),
      CHColumn("n_events", CHType.Int64.nullable))

    val sink = new ParquetStateSink(s"$outDir/user_state", Seq("user_id"),
      Seq("last_ts", "total_value", "n_events"))
    val offsets = new FileOffsetStore(s"$outDir/user_state.offset")
    val snapshot = changelog.filter(col("op") === Changelog.OpInsert).limit(0)
    val pipe = new Pipe(config, new ChangelogReplaySource(changelog, Some(snapshot)),
      sink, offsets, targetCols, tableName = "user_state")
    pipe.run() // replay source drains on empty peek, so this terminates
  }
}
