package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.databind.annotation.JsonDeserialize
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.ddl.TableOptions

/** Pipeline configuration, mirroring the reference's JSON config model
  * (reference: `src/config.rs:3-293`). Field names match the reference's
  * snake_case JSON keys; defaults match the reference's default fns
  * (reference: `src/config.rs:99-186`).
  */
case class PipeConfig(
    source: SourceConfig,
    target: TargetConfig,
    // Option + accessor (not Scala default args): Jackson leaves missing
    // primitive fields 0, which would silently zero every sleep/limit knob.
    // contentAs is required: erasure makes Jackson box small JSON ints as
    // Integer inside Option, which then fails the Long unbox at use time.
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sleep_millis_when_peek_failed: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sleep_millis_when_peek_is_empty: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sleep_millis_when_write_failed: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sleep_millis_after_sync_iteration: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    sleep_millis_after_sync_write: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    peek_changes_limit: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    peek_changes_timeout_millis: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    copy_batch_size: Option[Int] = None,
    disable_sync_loop: Option[Boolean] = None
) {
  def sleepWhenPeekFailed: Long    = sleep_millis_when_peek_failed.getOrElse(5000L)
  def sleepWhenPeekIsEmpty: Long   = sleep_millis_when_peek_is_empty.getOrElse(5000L)
  def sleepWhenWriteFailed: Long   = sleep_millis_when_write_failed.getOrElse(5000L)
  def sleepAfterSyncIteration: Long = sleep_millis_after_sync_iteration.getOrElse(100L)
  def sleepAfterSyncWrite: Long    = sleep_millis_after_sync_write.getOrElse(100L)
  def peekChangesLimit: Long       = peek_changes_limit.getOrElse(65536L)
  def peekChangesTimeoutMillis: Long = peek_changes_timeout_millis.getOrElse(5000L)
  def copyBatchSize: Int           = copy_batch_size.getOrElse(100000)
  // the reference's gate lives under target.clickhouse
  // (`src/config.rs:275`); the top-level key is a graft convenience
  def disableSyncLoop: Boolean     = disable_sync_loop
    .orElse(target.clickhouse.flatMap(_.disable_sync_loop))
    .getOrElse(false)
  /** Target-level parent table-option defaults (reference:
    * `src/config.rs:277`); absent when the target is not ClickHouse. */
  def parentTableOptions: TableOptions =
    target.clickhouse.map(_.parentTableOptions).getOrElse(TableOptions())
}

case class SourceConfig(
    source_type: String, // "postgres" | "mongodb" | "jdbc" | "parquet" (test replay)
    postgres: Option[PostgresConfig] = None,
    mongodb: Option[MongoConfig] = None,
    parquet_dir: Option[String] = None,
    jdbc: Option[JdbcSourceConfig] = None
)

case class TargetConfig(
    target_type: String, // "clickhouse" | "jdbc" | "parquet" (test state sink)
    clickhouse: Option[ClickHouseConfig] = None,
    parquet_dir: Option[String] = None,
    jdbc: Option[JdbcTargetConfig] = None
)

/** Generic live JDBC changelog source: any endpoint exposing a
  * seq-addressed changelog table peeks through the same bounded
  * non-consuming protocol as `pg_logical_slot_peek_binary_changes`
  * (reference: `src/adapter/postgres.rs:787-812`). Integration-tested
  * against embedded Derby; a live Postgres uses `source_type: postgres`
  * with the pgoutput decode path instead. */
case class JdbcSourceConfig(
    url: String,
    user: String = "",
    password: String = "",
    driver: Option[String] = None,
    changelog_table: String = "changelog",
    seq_column: String = "seq",
    snapshot_table: Option[String] = None,
    partition_column: Option[String] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    num_partitions: Option[Int] = None,
    offset_path: Option[String] = None
)

/** Live executing JDBC target. `dialect` picks the statement text:
  * "clickhouse" (the reference's, byte-compatible) or "ansi" (portable —
  * Derby/PG/DuckDB). `distributed_inserts` executes INSERT statements
  * per-partition on executors. */
case class JdbcTargetConfig(
    url: String,
    user: String = "",
    password: String = "",
    driver: Option[String] = None,
    database: String = "default",
    table: String = "t",
    dialect: String = "clickhouse",
    distributed_inserts: Boolean = true
)

case class PostgresConfig(
    connection: ConnectionConfig,
    tables: Seq[TableSource] = Seq.empty,
    publication_name: String = "clockpipe_publication",
    replication_slot_name: String = "clockpipe_slot",
    // Snapshot transport. The DEFAULT first_sync is Spark's partitioned
    // executor-side JDBC scan (the 100 TB shape — splits read in
    // parallel with pushdown). `use_copy_snapshot = true` switches to
    // the reference's COPY TO STDOUT stream
    // (`src/adapter/postgres.rs:832-910`): ONE serial server
    // conversation whose rows materialize on the driver before
    // parallelizing — byte-exact COPY semantics for modest tables, a
    // driver-memory ceiling on large ones. Opt-in for that reason.
    use_copy_snapshot: Option[Boolean] = None
) {
  def useCopySnapshot: Boolean = use_copy_snapshot.getOrElse(false)
}

case class MongoConfig(
    connection: ConnectionConfig,
    collections: Seq[TableSource] = Seq.empty,
    resume_token_path: Option[String] = None,
    // Resume-token persistence backend. The reference defines a single
    // variant, `file` (reference: `src/config.rs:71-76`,
    // `src/adapter/mongodb.rs:259-302`); accept the key for config
    // parity and reject anything else loudly rather than silently
    // running with a backend that does not exist.
    resume_token_storage: Option[String] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Integer])
    copy_batch_size: Option[Int] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    peek_timeout_millis: Option[Long] = None,
    // Replay transport: a directory of `<collection>.bson` files holding
    // concatenated BSON change-stream documents (the mongodump wire
    // format). Set → the pipe runs without a live server; unset → a live
    // client is required.
    bson_dir: Option[String] = None
) {
  def resumeTokenPath: String  = resume_token_path.getOrElse("./resume_token.json")
  def resumeTokenStorage: String = {
    val s = resume_token_storage.getOrElse("file")
    require(s == "file",
      s"resume_token_storage '$s' not supported; the only backend is 'file'")
    s
  }
  def copyBatchSize: Int       = copy_batch_size.getOrElse(1000)
  def peekTimeoutMillis: Long  = peek_timeout_millis.getOrElse(5000L)
}

case class ClickHouseConfig(
    connection: ConnectionConfig,
    // The reference keeps the sync-loop gate and the PARENT table-option
    // defaults under `target.clickhouse` (`src/config.rs:271-285`), not at
    // the top level — both accepted here for ported configs.
    disable_sync_loop: Option[Boolean] = None,
    table_options: Option[TableOptionsConfig] = None,
    // Execute INSERT statements per-partition on executors (the 100 TB
    // shape — statement text never transits the driver). `false` routes
    // every statement through the pipe's single target client, for
    // targets only the driver can reach (and substituted test clients).
    distributed_inserts: Option[Boolean] = None
) {
  def distributedInserts: Boolean = distributed_inserts.getOrElse(true)
  def parentTableOptions: TableOptions =
    table_options.map(_.toTableOptions).getOrElse(TableOptions())
}

/** The reference's nested `ClickHouseTableOptions` JSON object
  * (`src/config.rs:242-247`), attachable per table and as a parent
  * default under `target.clickhouse`. */
case class TableOptionsConfig(
    storage_policy: Option[String] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    granularity: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    min_age_to_force_merge_seconds: Option[Long] = None
) {
  def toTableOptions: TableOptions = TableOptions(
    granularity = granularity,
    minAgeToForceMergeSeconds = min_age_to_force_merge_seconds,
    storagePolicy = storage_policy)
}

/** Shared connection block. The reference splits this per engine
  * (`PostgresConnectionConfig` with `ssl_mode`/`ssl_root_cert`,
  * `src/config.rs:188-198`; `MongoDBConnectionConfig` with `app_name`,
  * `:78-86`); one class carries the union here, each field read only by
  * the source that defines it. */
case class ConnectionConfig(
    host: String = "localhost",
    port: Int = 0,
    username: String = "",
    password: String = "",
    database: String = "default",
    // Postgres only (reference: `src/adapter/postgres.rs:31-53`): the
    // reference's five sqlx ssl modes are exactly pgjdbc's `sslmode`
    // values, so they pass through to the JDBC URL verbatim.
    ssl_mode: Option[String] = None,
    ssl_root_cert: Option[String] = None,
    // MongoDB only (reference: `src/adapter/mongodb.rs:57`): carried for
    // config parity; applied by the live-client seam (docs/MIGRATION.md).
    app_name: Option[String] = None
) {
  /** Postgres JDBC URL with the reference's TLS options rendered as
    * pgjdbc properties. Unknown modes fail here — at config time, with
    * the valid set named — not as a driver error mid-connect. */
  def pgJdbcUrl: String = {
    val validModes = Set("disable", "prefer", "require", "verify-ca", "verify-full")
    ssl_mode.foreach(m => require(validModes.contains(m),
      s"ssl_mode '$m' invalid; one of: ${validModes.toSeq.sorted.mkString(", ")}"))
    val params =
      ssl_mode.map(m => s"sslmode=$m").toSeq ++
        ssl_root_cert.map(c => "sslrootcert=" +
          java.net.URLEncoder.encode(c, "UTF-8"))
    s"jdbc:postgresql://$host:$port/$database" +
      (if (params.isEmpty) "" else params.mkString("?", "&", ""))
  }
}

/** One replicated table/collection (reference: `src/config.rs:224-234`,
  * `89-97`): masking + copy-skip + per-table sink options.
  */
case class TableSource(
    schema_name: String = "public",
    // Mongo sources name this key `collection_name`
    // (reference: `src/config.rs:188-190`, docs/mongodb) — same slot
    @com.fasterxml.jackson.annotation.JsonAlias(Array("collection_name"))
    table_name: String,
    skip_copy: Boolean = false,
    mask_columns: Seq[String] = Seq.empty,
    // the reference's shape: options nested under `table_options`
    // (`src/config.rs:224-234`); the flat fields below are a graft
    // convenience and yield to the nested object when both are set
    table_options: Option[TableOptionsConfig] = None,
    storage_policy: Option[String] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    granularity: Option[Long] = None,
    @JsonDeserialize(contentAs = classOf[java.lang.Long])
    min_age_to_force_merge_seconds: Option[Long] = None
) {
  def tableOptions: TableOptions = tableOptions(TableOptions())

  /** Resolved options with parent inheritance, matching the reference's
    * `inherit_from` EXACTLY (`src/config.rs:259-269`): absent
    * `storage_policy` and `granularity` fall back to the target-level
    * parent; `min_age_to_force_merge_seconds` deliberately does NOT
    * inherit (the DDL generator applies its own 60 s default instead —
    * `src/adapter/mod.rs:100-104`). */
  def tableOptions(parent: TableOptions): TableOptions = {
    val nested = table_options.map(_.toTableOptions).getOrElse(TableOptions())
    TableOptions(
      granularity = nested.granularity.orElse(granularity)
        .orElse(parent.granularity),
      minAgeToForceMergeSeconds = nested.minAgeToForceMergeSeconds
        .orElse(min_age_to_force_merge_seconds),
      storagePolicy = nested.storagePolicy.orElse(storage_policy)
        .orElse(parent.storagePolicy))
  }
  def qualifiedName: String = s"$schema_name.$table_name"
}

object PipeConfig {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def fromJson(json: String): PipeConfig =
    mapper.readValue(json, classOf[PipeConfig])

  def fromFile(path: String): PipeConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
