package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.cdc.Changelog
import graft.config.{JdbcSourceConfig, JdbcTargetConfig, PipeConfig}
import graft.live.{JdbcChangelogSource, JdbcClient, JdbcConnInfo, PgOutputJdbcSource, PgRelation}
import graft.pipe.{CdcSource, ChangelogReplaySource, FileOffsetStore, MultiTablePipe, ParquetStateSink, Pipe, StatementPipe, TableSpec}
import graft.sinks.{AnsiDialect, ClickHouseDialect, StatementSink}
import graft.sources.{CatalogSql, Tables}
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

  /** Default directory for pipe offset files. Overridable via the
    * `graft.offsets.dir` system property (or `GRAFT_OFFSETS_DIR` env) so
    * test/bench runs can keep runtime state out of the working tree; a
    * production deployment leaves it at `./offsets` next to the process
    * like the reference's cwd-relative state files. */
  private[graft] def offsetsDir: String =
    sys.props.get("graft.offsets.dir")
      .orElse(sys.env.get("GRAFT_OFFSETS_DIR"))
      .getOrElse("./offsets")

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
      case "parquet"  => runParquetReplay(spark, config)
      case "jdbc"     => runJdbc(spark, config)
      case "postgres" => runPostgres(spark, config)
      case "mongodb"  => runMongo(spark, config)
      case other =>
        throw new IllegalArgumentException(
          s"source_type '$other' not supported; use postgres | mongodb | jdbc | parquet")
    }

  private def connInfo(url: String, user: String, password: String,
      driver: Option[String]): JdbcConnInfo =
    JdbcConnInfo(url, user, password, driver)

  /** Pre-flight health gate (reference: `src/pipes/postgres.rs:94-108`,
    * run before anything else at `:759-762`; `pipes/mongodb.rs` mirrors
    * it): probe the endpoint once and abort with a clean, attributed
    * error instead of failing on first use mid-initialize. */
  private def pingOrAbort(client: JdbcClient, role: String, url: String): Unit =
    if (!client.ping()) throw new IllegalStateException(
      s"$role ping failed: $url is unreachable; aborting before initialize")

  /** Generic live JDBC changelog pipe (integration-tested against embedded
    * Derby): peeks a seq-addressed changelog table, executes the statement
    * sequence against a JDBC target or appends to a parquet state sink. */
  private def runJdbc(spark: SparkSession, config: PipeConfig): Unit = {
    implicit val s: SparkSession = spark
    val sc = config.source.jdbc.getOrElse(
      throw new IllegalArgumentException("source.jdbc required"))
    // peek_changes_timeout_millis rides the source client as the JDBC
    // statement timeout (reference: `src/config.rs:151-154`)
    val srcInfo = connInfo(sc.url, sc.user, sc.password, sc.driver)
      .copy(queryTimeoutMillis = config.peekChangesTimeoutMillis)
    val client = new JdbcClient(srcInfo)
    try {
      pingOrAbort(client, "source", sc.url)
      val source = new JdbcChangelogSource(
        client,
        JdbcChangelogSource.tablePeekSql(sc.changelog_table, sc.seq_column),
        sc.snapshot_table match {
          case Some(t) => JdbcChangelogSource.snapshotScan(
            spark, srcInfo, t, sc.partition_column, sc.num_partitions.getOrElse(8))
          case None => () => spark.emptyDataFrame
        },
        seqCol = sc.seq_column.toLowerCase)
      // target schema = changelog columns minus the envelope (seq, op);
      // PKs from JDBC metadata (portable information_schema analogue).
      // Metadata names are lowercased, so compare the knob lowercased too.
      val envelope = Set(sc.seq_column.toLowerCase, "seq", "op")
      val pkTable = sc.snapshot_table.getOrElse(sc.changelog_table)
      val pks = client.primaryKeys(None, pkTable.toUpperCase) match {
        case Seq() => client.primaryKeys(None, pkTable)
        case found => found
      }
      val targetCols = client.tableColumns(None, sc.changelog_table.toUpperCase) match {
        case Seq() => client.tableColumns(None, sc.changelog_table)
        case found => found
      }
      val columns = targetCols.filterNot { case (n, _, _) => envelope.contains(n) }
        .map { case (n, dt, nullable) =>
          val pk = pks.contains(n)
          CHColumn(n, CHType.fromSparkType(dt, nullable && !pk), isPrimaryKey = pk)
        }
      runToTarget(spark, config, source, columns, pipeName = sc.changelog_table,
        offsetPath = sc.offset_path)
    } finally client.close()
  }

  /** Live Postgres logical-replication pipe: pgoutput frames peeked over
    * JDBC (`pg_logical_slot_peek_binary_changes`), decoded on executors,
    * slot advanced after each committed batch. Needs the PG JDBC driver on
    * the classpath and a reachable server.
    *
    * ALL configured tables share ONE peek over the single replication
    * slot: each batch decodes once, routes per table (A3), and the slot
    * advances only after EVERY table's writes committed — per-table pipes
    * over a shared slot would destroy the other tables' pending events on
    * each advance. This is the reference's own shape (one slot, one
    * bucketed batch loop — `src/pipes/postgres.rs:295-420`). */
  private def runPostgres(spark: SparkSession, config: PipeConfig): Unit = {
    val pg = config.source.postgres.getOrElse(
      throw new IllegalArgumentException("source.postgres required"))
    val conn = pg.connection
    // TLS options ride the URL as pgjdbc properties (reference:
    // `src/adapter/postgres.rs:31-53` sets the same modes on sqlx)
    val url = conn.pgJdbcUrl
    val info = connInfo(url, conn.username, conn.password, Some("org.postgresql.Driver"))
      .copy(queryTimeoutMillis = config.peekChangesTimeoutMillis)
    val client = new JdbcClient(info)
    try runPostgresWith(spark, config, pg, client, info, url)
    finally client.close()
  }

  /** The PG pipe body behind the source-client seam: the full-lifecycle
    * spec (LivePostgresPipeSpec) drives it with a scripted catalog client
    * emitting real pgoutput frames while the target stays a real JDBC
    * endpoint — the same path a live server exercises. */
  private[graft] def runPostgresWith(
      spark: SparkSession, config: PipeConfig,
      pg: graft.config.PostgresConfig, client: JdbcClient,
      info: JdbcConnInfo, url: String,
      // target transport seam, mirroring the SOURCE `client` param: the
      // production default dials the configured JDBC url; executable
      // test endpoints (the ClickHouse statement stub) substitute their
      // parsed engine behind the same JdbcClient verbs
      targetClientFor: JdbcConnInfo => JdbcClient = new JdbcClient(_)): Unit = {
    implicit val s: SparkSession = spark
    val tableClients = scala.collection.mutable.ArrayBuffer.empty[AutoCloseable]
    try {
      pingOrAbort(client, "source", url)
      // ---- initialize phase (reference: `src/pipes/postgres.rs:110-120`) ----
      // publication + replication slot, created idempotently; skipped when
      // the sync loop is disabled, exactly as the reference (`:522-525`)
      if (!config.disableSyncLoop)
        graft.pipe.Initializer.setupPublication(
          sql => client.query(sql)._2, client.execute,
          pg.publication_name, pg.replication_slot_name,
          pg.tables.map(t => (t.schema_name, t.table_name)))
      // S5: column list + PK membership through the reference's catalog SQL
      val tableInfos = pg.tables.map { tbl =>
        val colsDf = client.query(CatalogSql.pgColumns(tbl.schema_name, tbl.table_name))._2
        val columns = colsDf.map { r =>
          CHColumn(r.getString(0),
            CHType.fromPgUdt(r.getString(1),
              nullable = r.getBoolean(2) && !r.getBoolean(4)),
            isPrimaryKey = r.getBoolean(4))
        }
        val relId = client.query(
          CatalogSql.pgRelationIds(tbl.schema_name, Seq(tbl.table_name)))._2
          .headOption.map(_.get(0).toString.toLong).getOrElse(
            throw new IllegalArgumentException(s"relation ${tbl.qualifiedName} not found"))
        (tbl, columns, PgRelation(relId, tbl.table_name, columns.map(_.name)))
      }
      val relations = tableInfos.map(_._3)
      val source = new PgOutputJdbcSource(
        client, pg.replication_slot_name, pg.publication_name, relations,
        () => spark.emptyDataFrame)
      // one routed changelog: decode once, every table's slice survives
      val routed = new CdcSource {
        def snapshot() = spark.emptyDataFrame
        def peekChanges(after: Long, limit: Long) =
          PgOutputJdbcSource.multiTableSlices(
            source.peekChanges(after, limit), relations)
      }
      // parent table-option defaults under target.clickhouse; per-table
      // options inherit storage_policy/granularity from them (reference:
      // `src/config.rs:259-269`, applied at `src/pipes/postgres.rs:645`)
      val parentOpts = config.parentTableOptions
      val tables = tableInfos.map { case (tbl, columns, _) =>
        // the source table's comment travels onto the created target table
        // (reference: `src/pipes/postgres.rs:631-637`)
        val comment = client
          .queryScalar(CatalogSql.pgTableComment(tbl.schema_name, tbl.table_name))
          .map(_.toString).getOrElse("")
        tbl.table_name -> TableSpec(
          columns,
          targetBatchSink(spark, config, columns, tbl.qualifiedName, tableClients,
            initComment = Some(comment),
            initOptions = tbl.tableOptions(parentOpts),
            clientFor = targetClientFor),
          tbl.mask_columns.toSet)
      }.toMap
      // slot advance rides the offset commit — AFTER all table writes
      val offsets = new FileOffsetStore(s"$offsetsDir/${pg.replication_slot_name}.offset") {
        override def write(offset: Long): Unit = {
          super.write(offset); source.advance(offset)
        }
      }
      val pipe = new MultiTablePipe(config, routed, tables, offsets)
      pipe.firstSync(tableInfos.map { case (tbl, columns, _) =>
        tbl.table_name -> (() => if (tbl.skip_copy) spark.emptyDataFrame
          // COPY is OPT-IN (PostgresConfig.use_copy_snapshot): the
          // reference's COPY TO STDOUT stream
          // (`src/adapter/postgres.rs:832-910`) is one serial server
          // conversation whose rows land on the driver before
          // parallelizing — exact COPY text semantics, but a
          // driver-memory ceiling. The default stays the partitioned
          // executor-side JDBC scan (the 100 TB shape). A COPY-less
          // driver under the flag falls back to the scan.
          else if (pg.useCopySnapshot)
            // bracket-consumed: a parse failure mid-stream cancels the
            // COPY so the shared connection returns to command mode
            client.copyOut(tbl.qualifiedName, columns.map(_.name))(chunks =>
              graft.sources.CopySource.snapshot(spark, chunks, columns))
              .getOrElse(
                JdbcChangelogSource.snapshotScan(spark, info, tbl.qualifiedName)())
          else JdbcChangelogSource.snapshotScan(spark, info, tbl.qualifiedName)())
      }.toMap)
      if (!config.disableSyncLoop) pipe.syncLoop()
    } finally {
      // every per-table target client — the sinks live as long as the
      // pipe, so this is the one release point (the source client is the
      // caller's to close)
      tableClients.foreach(c => try c.close() catch { case _: Exception => () })
    }
  }

  /** Per-table [[graft.pipe.BatchSink]] for the configured target. Live
    * targets open one [[JdbcClient]] per routed table for the lifetime of
    * the (run-forever) pipe; it is registered with `closers` so the caller
    * can release every connection when the pipe exits.
    *
    * `initComment = Some(comment)` runs the initialize-phase table setup
    * first — CREATE TABLE when the target lacks it, ADD COLUMN drift
    * reconciliation when it exists (reference:
    * `src/pipes/postgres.rs:614-743`). */
  private def targetBatchSink(
      spark: SparkSession, config: PipeConfig,
      columns: Seq[CHColumn], pipeName: String,
      closers: scala.collection.mutable.Buffer[AutoCloseable],
      initComment: Option[String] = None,
      initOptions: graft.ddl.TableOptions = graft.ddl.TableOptions(),
      clientFor: JdbcConnInfo => JdbcClient = new JdbcClient(_)): graft.pipe.BatchSink = {
    implicit val s: SparkSession = spark
    config.target.target_type match {
      case "parquet" =>
        val outDir = config.target.parquet_dir.getOrElse(
          throw new IllegalArgumentException("target.parquet_dir required"))
        new ParquetStateSink(s"$outDir/$pipeName",
          columns.filter(_.isPrimaryKey).map(_.name),
          columns.filterNot(_.isPrimaryKey).map(_.name))
      case "jdbc" | "clickhouse" =>
        val (tcConfigured, dialect) = targetJdbc(config, pipeName)
        // multi-table routing: each ROUTED table lands in its own target
        // table named after it (the reference's one-table-per-source
        // model, `src/adapter/mod.rs:90`) — the single configured
        // `target.jdbc.table` only names SINGLE-table pipes (runToTarget)
        val tc =
          if (config.target.target_type == "jdbc")
            tcConfigured.copy(table = pipeName.split('.').last)
          else tcConfigured
        val info = connInfo(tc.url, tc.user, tc.password, tc.driver)
        val client = clientFor(info)
        closers += client
        pingOrAbort(client, "target", tc.url)
        initComment.foreach { comment =>
          graft.pipe.Initializer.setupTable(
            () => targetColumnNames(client, tc.database, tc.table), client.execute, dialect,
            tc.database, tc.table, columns,
            options = initOptions, tableComment = comment)
        }
        val sink = new StatementSink(tc.database, tc.table, columns,
          client.execute, Set.empty, config.copyBatchSize, dialect,
          insertExec = if (tc.distributed_inserts) Some(info) else None)
        sink.asBatchSink(() => client
          .queryScalar(dialect.nonEmptyProbe(tc.database, tc.table))
          .exists(graft.sinks.SqlDialect.truthy))
      case other =>
        throw new IllegalArgumentException(s"target_type '$other' not supported")
    }
  }

  /** Target column-name probe through JDBC metadata — the portable
    * analogue of the reference's `system.columns` read
    * (`src/adapter/clickhouse.rs:190-220`). Scoped to the configured
    * database and exact-matched on the table name (see
    * [[JdbcClient.columnsOf]]); raw column-name case. Empty means the
    * table does not exist. */
  private def targetColumnNames(
      client: JdbcClient, database: String, table: String): Seq[String] =
    client.columnsOf(Some(database).filter(_.nonEmpty), table).map(_._1)

  /** Effective JDBC target for one ROUTED Mongo collection. Mirrors the
    * PG multi-table routing (targetBatchSink): with a 'jdbc' target and
    * MULTIPLE collections, each collection lands in its own table named
    * after it (the reference's one-table-per-source model,
    * `src/adapter/mod.rs:90`) — otherwise two collections would evolve
    * mixed schemas into ONE table and their `_id`-keyed upserts/deletes
    * would collide. The single configured `target.jdbc.table` names
    * single-collection pipes only; the clickhouse branch already routes
    * per collection inside [[targetJdbc]]. */
  private[graft] def mongoTargetJdbc(
      config: PipeConfig, mc: graft.config.MongoConfig,
      coll: graft.config.TableSource): (JdbcTargetConfig, graft.sinks.SqlDialect) = {
    val (tcConfigured, dialect) = targetJdbc(config, coll.table_name)
    val tc =
      if (config.target.target_type == "jdbc" && mc.collections.lengthIs > 1)
        tcConfigured.copy(table = coll.table_name)
      else tcConfigured
    (tc, dialect)
  }

  private def targetJdbc(config: PipeConfig, pipeName: String): (JdbcTargetConfig, graft.sinks.SqlDialect) =
    config.target.target_type match {
      case "jdbc" =>
        val tc = config.target.jdbc.getOrElse(
          throw new IllegalArgumentException("target.jdbc required"))
        (tc, if (tc.dialect == "ansi") AnsiDialect else ClickHouseDialect)
      case _ =>
        val chCfg = config.target.clickhouse.getOrElse(
          throw new IllegalArgumentException("target.clickhouse required"))
        val ch = chCfg.connection
        (JdbcTargetConfig(
          url = s"jdbc:clickhouse://${ch.host}:${ch.port}/${ch.database}",
          user = ch.username, password = ch.password,
          database = ch.database, table = pipeName.split('.').last,
          distributed_inserts = chCfg.distributedInserts),
          ClickHouseDialect)
    }

  /** Mongo change-stream pipe over the replay transport: `bson_dir`
    * holds one `<collection>.bson` file per collection — concatenated
    * BSON change-stream documents, the mongodump wire format. The target
    * schema evolves PER BATCH with the reference's first-type-wins fold
    * (`src/pipes/mongodb.rs:306-333`, `588-648`): each peeked window ADD
    * COLUMNs its newly-typed fields before routing its rows, so fields
    * land from the batch where their first typed value appeared and
    * earlier rows are never backfilled. The resume token persists after
    * each committed batch (`src/adapter/mongodb.rs:259-302`). A live
    * deployment replaces the file fetch with a `watch` cursor behind the
    * same callback (see docs/MIGRATION.md). */
  private def runMongo(spark: SparkSession, config: PipeConfig): Unit =
    runMongoWith(spark, config)

  /** The Mongo pipe body behind the same two seams as
    * [[runPostgresWith]]: `driverResolve` substitutes the change-stream
    * driver's class resolution (the offline stub driver in
    * MongoFullTopologySpec; production reflects over the real
    * `mongodb-driver-sync` coordinates), and `targetClientFor` the
    * target transport (the ClickHouse statement stub; production dials
    * the configured JDBC url). `pollForever` overrides the live
    * transport's poll-on-empty loop — a bounded verification run drains
    * the pending stream and returns, the deployment default keeps the
    * reference's tail-forever loop (`src/pipes/mongodb.rs:313-345`). */
  private[graft] def runMongoWith(
      spark: SparkSession, config: PipeConfig,
      driverResolve: Option[String => Class[_]] = None,
      targetClientFor: JdbcConnInfo => JdbcClient = new JdbcClient(_),
      pollForever: Option[Boolean] = None): Unit = {
    implicit val s: SparkSession = spark
    val mc = config.source.mongodb.getOrElse(
      throw new IllegalArgumentException("source.mongodb required"))
    mc.resumeTokenStorage // validate: only the reference's `file` backend exists
    // transport: recorded replay when bson_dir is set; otherwise the
    // live driver behind LiveMongo's classpath probe — absent jar fails
    // HERE with the hint, before any per-collection state is touched.
    // An injected resolver IS the driver, so the probe defers to it.
    val live = mc.bson_dir.isEmpty
    if (live && driverResolve.isEmpty && !graft.mongo.LiveMongo.driverPresent)
      throw new IllegalStateException(
        "live MongoDB needs org.mongodb:mongodb-driver-sync on the " +
          "classpath (no driver jar in this build), or set " +
          "source.mongodb.bson_dir to replay a recorded change stream " +
          "(docs/MIGRATION.md)")
    val conn = mc.connection
    mc.collections.foreach { coll =>
      val transportClosers = scala.collection.mutable.ArrayBuffer.empty[AutoCloseable]
      val fetch: (Option[String], Long) => Seq[Array[Byte]] = mc.bson_dir match {
        case Some(dir) =>
          val raw = graft.mongo.BsonFile.readDocuments(s"$dir/${coll.table_name}.bson")
          val events = raw.map(graft.mongo.ChangeStream.decode)
          (resume, limit) => {
            val from = resume.map(t => events.indexWhere(_.resumeToken.contains(t)) + 1)
              .getOrElse(0)
            raw.slice(from, from + math.min(limit, Int.MaxValue).toInt)
          }
        case None =>
          val (opener, closer) = graft.mongo.LiveMongo.reflectiveTransport(
            graft.mongo.LiveMongo.uri(conn.host, conn.port,
              conn.username, conn.password, conn.app_name),
            conn.database, coll.table_name,
            driverResolve.getOrElse(Class.forName(_)))
          transportClosers += closer
          graft.mongo.LiveMongo.fetchCallback(opener)
      }
      // one cursor per collection stream (the reference watches ONE
      // database stream with one token; replay files are per-collection,
      // so each gets its own token file)
      val tokens = new graft.pipe.ResumeTokenStore(
        if (mc.collections.lengthIs > 1)
          s"${mc.resumeTokenPath}.${coll.table_name}"
        else mc.resumeTokenPath)
      val initial = graft.mongo.MongoInference.initialSchema
      val masks = coll.mask_columns.toSet
      val closers = scala.collection.mutable.ArrayBuffer.empty[AutoCloseable]

      val pipe = config.target.target_type match {
        case "parquet" =>
          val outDir = config.target.parquet_dir.getOrElse(
            throw new IllegalArgumentException("target.parquet_dir required"))
          // the state sink needs no DDL: its reader schema-merges the log
          new graft.mongo.MongoPipe(config, fetch, tokens, initial,
            addColumn = _ => (),
            sinkFor = cols => new graft.pipe.ParquetStateSink(
              s"$outDir/${coll.table_name}",
              cols.filter(_.isPrimaryKey).map(_.name),
              cols.filterNot(_.isPrimaryKey).map(_.name),
              mergeSchema = true),
            maskColumns = masks)
        case "jdbc" | "clickhouse" =>
          val (tc, dialect) = mongoTargetJdbc(config, mc, coll)
          val info = connInfo(tc.url, tc.user, tc.password, tc.driver)
          val client = targetClientFor(info)
          closers += client
          pingOrAbort(client, "target", tc.url)
          // initialize: a fresh Mongo target is created `_id`-only
          // (reference: `src/pipes/mongodb.rs:532-554`), with the
          // collection's table options (parent-inherited) on the DDL
          graft.pipe.Initializer.setupTable(
            () => targetColumnNames(client, tc.database, tc.table), client.execute,
            dialect, tc.database, tc.table, initial,
            options = coll.tableOptions(config.parentTableOptions))
          // … and the running schema adopts whatever the target now has
          // (load_table_table_info, `:574-585`) — a pre-created full
          // table renders every field from the first batch. Column-name
          // case is PRESERVED ([[JdbcClient.columnsOf]]): Mongo field
          // names are case-significant, and a lowercased adoption would
          // silently stop matching camelCase document fields on restart
          val adopted = client
            .columnsOf(Some(tc.database).filter(_.nonEmpty), tc.table)
            .map { case (n, dt, nullable) =>
              CHColumn(n, CHType.fromSparkType(dt, nullable && n != "_id"),
                isPrimaryKey = n == "_id")
            }.toVector
          new graft.mongo.MongoPipe(config, fetch, tokens,
            if (adopted.nonEmpty) adopted else initial,
            addColumn = c =>
              client.execute(dialect.addColumnQuery(tc.database, tc.table, c)),
            sinkFor = cols => new StatementSink(tc.database, tc.table, cols,
              client.execute, Set.empty, config.copyBatchSize, dialect,
              insertExec = if (tc.distributed_inserts) Some(info) else None)
              .asBatchSink(() => client
                .queryScalar(dialect.nonEmptyProbe(tc.database, tc.table))
                .exists(graft.sinks.SqlDialect.truthy)),
            maskColumns = masks)
        case other =>
          throw new IllegalArgumentException(s"target_type '$other' not supported")
      }
      // same gate as every other pipe path: disable_sync_loop (top-level
      // or the reference's target.clickhouse location) stops after the
      // initialize phase (reference: `src/config.rs:280-284`). A live
      // transport polls forever (the reference's loop); replay drains.
      try if (!config.disableSyncLoop)
        pipe.syncLoop(live = pollForever.getOrElse(live))
      finally (closers ++ transportClosers).foreach(
        c => try c.close() catch { case _: Exception => () })
    }
  }

  /** Wire a source to the configured target (executing JDBC/ClickHouse
    * sink, or the parquet state sink). */
  private def runToTarget(
      spark: SparkSession, config: PipeConfig, source: CdcSource,
      columns: Seq[CHColumn], pipeName: String,
      advance: Long => Unit = _ => (),
      maskColumns: Set[String] = Set.empty,
      offsetPath: Option[String] = None): Unit = {
    implicit val s: SparkSession = spark
    config.target.target_type match {
      case "jdbc" | "clickhouse" =>
        val (tc, dialect) = targetJdbc(config, pipeName)
        val info = connInfo(tc.url, tc.user, tc.password, tc.driver)
        val client = new JdbcClient(info)
        try {
          pingOrAbort(client, "target", tc.url)
          val sink = new StatementSink(tc.database, tc.table, columns,
            client.execute, maskColumns, config.copyBatchSize, dialect,
            insertExec = if (tc.distributed_inserts) Some(info) else None)
          val offsets = new FileOffsetStore(
            offsetPath.getOrElse(s"$offsetsDir/$pipeName.offset"))
          // K6: O(1) existence probe, never COUNT(*) over the target
          val probe = () => client
            .queryScalar(dialect.nonEmptyProbe(tc.database, tc.table))
            .exists(graft.sinks.SqlDialect.truthy)
          val pipe = new StatementPipe(config, source, sink, offsets, columns,
            maskColumns, targetNonEmpty = probe, advance = advance)
          // initialize phase (reference: `src/pipes/postgres.rs:614-743`):
          // probe the target, CREATE TABLE when absent, ADD COLUMN drift
          // when present — a pre-existing in-sync table is a no-op; the
          // target-level parent table options apply (no TableSource here)
          graft.pipe.Initializer.setupTable(
            () => targetColumnNames(client, tc.database, tc.table), client.execute,
            dialect, tc.database, tc.table, columns,
            options = config.parentTableOptions)
          pipe.firstSync()
          if (!config.disableSyncLoop) pipe.syncLoop()
        } finally client.close()
      case "parquet" =>
        val outDir = config.target.parquet_dir.getOrElse(
          throw new IllegalArgumentException("target.parquet_dir required"))
        val valueCols = columns.filterNot(_.isPrimaryKey).map(_.name)
        val sink = new ParquetStateSink(s"$outDir/$pipeName",
          columns.filter(_.isPrimaryKey).map(_.name), valueCols)
        // the offset write IS the commit point; cursors that need a
        // source-side advance (slot advance, resume-token persist) ride it
        val offsets = new FileOffsetStore(s"$outDir/$pipeName.offset") {
          override def write(offset: Long): Unit = {
            super.write(offset); advance(offset)
          }
        }
        new Pipe(config, source, sink, offsets, columns,
          maskColumns, tableName = pipeName).run()
      case other =>
        throw new IllegalArgumentException(s"target_type '$other' not supported")
    }
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
