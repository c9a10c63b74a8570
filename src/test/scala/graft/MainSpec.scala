package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipeConfig

/** EP1: config-file load → dispatch → full pipe run (SURVEY.md sec 3). */
class MainSpec extends AnyFunSuite with SparkTestBase {

  test("run with parquet replay config materializes the user_state table") {
    val out = Files.createTempDirectory("graft-main").toString
    val cfgPath = s"$out/cfg.json"
    Files.writeString(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "source": {"source_type": "parquet", "parquet_dir": "/root/testdata/sf0.001"},
         |  "target": {"target_type": "parquet", "parquet_dir": "$out"},
         |  "peek_changes_limit": 200
         |}""".stripMargin)
    val config = PipeConfig.fromFile(cfgPath)
    assert(config.peekChangesLimit == 200L)

    Main.runWith(spark, config)

    val state = spark.read.parquet(s"$out/user_state/log")
    assert(state.count() > 0)
    // the materialized view equals the declarative final state
    val sink = new graft.pipe.ParquetStateSink(s"$out/user_state",
      Seq("user_id"), Seq("last_ts", "total_value", "n_events"))(spark)
    assert(sink.read().count() > 0)
  }

  test("unknown source type is rejected") {
    val cfg = PipeConfig.fromJson(
      """{"source": {"source_type": "postgres"}, "target": {"target_type": "parquet"}}""")
    intercept[IllegalArgumentException](Main.runWith(spark, cfg))
  }
}
