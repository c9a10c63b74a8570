package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Config parsing + defaults (reference: `src/config.rs:99-186`). */
class PipeConfigSpec extends AnyFunSuite {

  test("minimal JSON: all defaults match the reference's default fns") {
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"parquet","parquet_dir":"/tmp/x"},
         "target":{"target_type":"parquet","parquet_dir":"/tmp/y"}}""")
    assert(cfg.peekChangesLimit == 65536L)
    assert(cfg.peekChangesTimeoutMillis == 5000L)
    assert(cfg.copyBatchSize == 100000)
    assert(cfg.sleepWhenPeekFailed == 5000L)
    assert(cfg.sleepWhenPeekIsEmpty == 5000L)
    assert(cfg.sleepWhenWriteFailed == 5000L)
    assert(cfg.sleepAfterSyncIteration == 100L)
    assert(cfg.sleepAfterSyncWrite == 100L)
    assert(!cfg.disableSyncLoop)
  }

  test("explicit knobs override defaults; table source options parse") {
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"postgres","postgres":{
           "connection":{"host":"h","port":5432,"username":"u","password":"p","database":"d"},
           "tables":[{"schema_name":"public","table_name":"users",
                      "skip_copy":true,"mask_columns":["password"],
                      "granularity":4096}]}},
         "target":{"target_type":"clickhouse","clickhouse":{
           "connection":{"host":"ch","port":8123}}},
         "peek_changes_limit":1000,
         "disable_sync_loop":true}""")
    assert(cfg.peekChangesLimit == 1000L)
    assert(cfg.disableSyncLoop)
    val t = cfg.source.postgres.get.tables.head
    assert(t.qualifiedName == "public.users")
    assert(t.skip_copy)
    assert(t.mask_columns == Seq("password"))
    assert(t.tableOptions.granularity.contains(4096L))
    // unset per-table options stay None (fall back to global defaults)
    assert(t.tableOptions.minAgeToForceMergeSeconds.isEmpty)
  }

  test("mongo config defaults") {
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"mongodb","mongodb":{
           "connection":{"host":"m","port":27017},
           "collections":[{"table_name":"profiles"}]}},
         "target":{"target_type":"parquet","parquet_dir":"/tmp/y"}}""")
    val m = cfg.source.mongodb.get
    assert(m.copyBatchSize == 1000)
    assert(m.peekTimeoutMillis == 5000L)
    assert(m.resumeTokenPath == "./resume_token.json")
  }

  test("unknown JSON fields are ignored") {
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"parquet"},"target":{"target_type":"parquet"},
         "future_knob":123}""")
    assert(cfg.source.source_type == "parquet")
  }
}
