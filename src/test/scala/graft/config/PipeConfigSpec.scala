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

  test("nested table_options parse and inherit like the reference") {
    // reference shape: options under `table_options` per table, parent
    // defaults + sync-loop gate under target.clickhouse
    // (`src/config.rs:224-234`, `271-285`)
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"postgres","postgres":{
           "connection":{"host":"h","port":5432},
           "tables":[
             {"table_name":"a","table_options":{"granularity":1024}},
             {"table_name":"b"},
             {"table_name":"c","table_options":{
                "storage_policy":"own","granularity":256,
                "min_age_to_force_merge_seconds":30}}]}},
         "target":{"target_type":"clickhouse","clickhouse":{
           "connection":{"host":"ch","port":8123},
           "disable_sync_loop":true,
           "table_options":{"storage_policy":"hdd","granularity":4096,
                            "min_age_to_force_merge_seconds":120}}}}""")
    assert(cfg.disableSyncLoop) // gate read from target.clickhouse
    // the reference's own example config carries "table_options": null —
    // explicit null must parse as absent, not throw
    assert(PipeConfig.fromJson(
      """{"source":{"source_type":"parquet","parquet_dir":"/tmp/x"},
         "target":{"target_type":"clickhouse","clickhouse":{
           "connection":{"host":"ch","port":8123},"table_options":null}}}""")
      .target.clickhouse.get.parentTableOptions == graft.ddl.TableOptions())
    val parent = cfg.target.clickhouse.get.parentTableOptions
    val Seq(a, b, c) = cfg.source.postgres.get.tables.map(_.tableOptions(parent))
    // a: own granularity, inherited storage_policy
    assert(a.granularity.contains(1024L) && a.storagePolicy.contains("hdd"))
    // b: inherits storage_policy + granularity; min_age does NOT inherit
    // (inherit_from copies only those two — `src/config.rs:259-269`)
    assert(b.granularity.contains(4096L) && b.storagePolicy.contains("hdd"))
    assert(b.minAgeToForceMergeSeconds.isEmpty)
    // c: fully self-specified, parent ignored
    assert(c == graft.ddl.TableOptions(Some(256L), Some(30L), Some("own")))
  }

  test("pg TLS options render as pgjdbc URL properties") {
    // reference: `src/config.rs:188-213` (PostgresSslMode serde names),
    // `src/adapter/postgres.rs:31-53` — the five mode names pass through
    val conn = ConnectionConfig(host = "h", port = 5432, database = "d")
    assert(conn.pgJdbcUrl == "jdbc:postgresql://h:5432/d")
    assert(conn.copy(ssl_mode = Some("verify-full"),
        ssl_root_cert = Some("/certs/root ca.pem")).pgJdbcUrl ==
      "jdbc:postgresql://h:5432/d?sslmode=verify-full&sslrootcert=%2Fcerts%2Froot+ca.pem")
    // sslrootcert without a mode is still rendered (pgjdbc allows it)
    assert(conn.copy(ssl_root_cert = Some("ca.pem")).pgJdbcUrl
      .endsWith("?sslrootcert=ca.pem"))
    val bad = intercept[IllegalArgumentException](
      conn.copy(ssl_mode = Some("allow")).pgJdbcUrl)
    assert(bad.getMessage.contains("verify-full"))
  }

  test("mongo resume_token_storage accepts only the reference's file backend") {
    def mongo(extra: String) = PipeConfig.fromJson(
      s"""{"source":{"source_type":"mongodb","mongodb":{
           "connection":{"host":"m","port":27017,"app_name":"graft"},
           "collections":[{"table_name":"profiles"}]$extra}},
         "target":{"target_type":"parquet","parquet_dir":"/tmp/y"}}""")
      .source.mongodb.get
    assert(mongo("").resumeTokenStorage == "file")
    // the reference's Mongo key is `collection_name` (docs/mongodb);
    // both spellings land in table_name
    assert(PipeConfig.fromJson(
      """{"source":{"source_type":"mongodb","mongodb":{
           "connection":{"host":"m"},
           "collections":[{"collection_name":"user"}]}},
         "target":{"target_type":"parquet","parquet_dir":"/tmp/y"}}""")
      .source.mongodb.get.collections.head.table_name == "user")
    assert(mongo(""","resume_token_storage":"file"""").resumeTokenStorage == "file")
    assert(mongo("").connection.app_name.contains("graft"))
    val bad = intercept[IllegalArgumentException](
      mongo(""","resume_token_storage":"redis"""").resumeTokenStorage)
    assert(bad.getMessage.contains("redis"))
  }

  test("unknown JSON fields are ignored") {
    val cfg = PipeConfig.fromJson(
      """{"source":{"source_type":"parquet"},"target":{"target_type":"parquet"},
         "future_knob":123}""")
    assert(cfg.source.source_type == "parquet")
  }
}
