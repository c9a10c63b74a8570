package graft.ddl

import graft.types.{CHColumn, CHType}

/** Target-table options (reference: `src/config.rs:99-121`). */
case class TableOptions(
    granularity: Option[Long] = None,
    minAgeToForceMergeSeconds: Option[Long] = None,
    storagePolicy: Option[String] = None
)

/** DDL text generation for the ClickHouse-style sink.
  *
  * Byte-for-byte compatible with the reference's generators
  * (reference: `src/adapter/mod.rs:53-141`): ReplacingMergeTree engine,
  * ORDER BY over the PK columns, granularity / force-merge settings,
  * single-quote escaping rules per clause.
  */
object Ddl {
  val DefaultGranularity = 8192L        // reference: src/config.rs:118-121
  val DefaultMinAgeToForceMerge = 60L   // reference: src/config.rs:113-116

  /** CREATE TABLE … ENGINE = ReplacingMergeTree() …
    * (reference: `src/adapter/mod.rs:53-123`). Column comments escape `'`
    * as `"`; table comment and storage policy escape `'` as `''`.
    */
  def createTableQuery(
      database: String,
      tableName: String,
      columns: Seq[CHColumn],
      options: TableOptions = TableOptions(),
      tableComment: String = ""
  ): String = {
    val sb = new StringBuilder
    sb.append(s"CREATE TABLE $database.$tableName")
    sb.append('(')
    sb.append(columns.map { col =>
      s"`${col.name}` ${col.chType.typeText} COMMENT '${col.comment.replace("'", "\"")}'"
    }.mkString(", \n"))
    sb.append(')')
    sb.append(" ENGINE = ReplacingMergeTree()\n")
    val pks = columns.filter(_.isPrimaryKey).map(_.name)
    if (pks.nonEmpty) sb.append(s"ORDER BY (${pks.mkString(", ")})\n")
    sb.append("SETTINGS\n")
    sb.append(s"index_granularity = ${options.granularity.getOrElse(DefaultGranularity)}\n")
    sb.append(
      s", min_age_to_force_merge_seconds = ${options.minAgeToForceMergeSeconds.getOrElse(DefaultMinAgeToForceMerge)}\n")
    options.storagePolicy.foreach { p =>
      sb.append(s", storage_policy = '${p.replace("'", "''")}'\n")
    }
    sb.append(s"COMMENT '${tableComment.replace("'", "''")}'\n")
    sb.append(';')
    sb.toString
  }

  /** ALTER TABLE … ADD COLUMN (reference: `src/adapter/mod.rs:125-141`). */
  def addColumnQuery(database: String, tableName: String, column: CHColumn): String = {
    val comment = column.comment.replace("'", "\"")
    s"ALTER TABLE $database.$tableName ADD COLUMN `${column.name}` ${column.chType.typeText} COMMENT '$comment';"
  }

  /** TRUNCATE (reference: `src/adapter/clickhouse.rs:255-265`). */
  def truncateQuery(database: String, tableName: String): String =
    s"TRUNCATE TABLE $database.$tableName"

  /** Schema-drift reconciliation: source columns missing from the target
    * get ADD COLUMN statements, in source order; dropped source columns are
    * left alone (reference: `src/pipes/postgres.rs:679-725`,
    * `docs/postgres/README.md:55-57`).
    */
  def reconcileDrift(
      database: String,
      tableName: String,
      sourceColumns: Seq[CHColumn],
      targetColumnNames: Set[String]
  ): Seq[String] =
    driftColumns(sourceColumns, targetColumnNames)
      .map(addColumnQuery(database, tableName, _))

  /** The drift set itself: source columns the target lacks, in source
    * order, Unknown-typed columns deferred until a typed value appears
    * (reference: `src/pipes/mongodb.rs:615-627`). Shared by the CH
    * generator above and the dialect-generic [[graft.pipe.Initializer]]. */
  def driftColumns(
      sourceColumns: Seq[CHColumn],
      targetColumnNames: Set[String]
  ): Seq[CHColumn] =
    sourceColumns
      .filterNot(c => targetColumnNames.contains(c.name))
      .filterNot(_.chType == CHType.Unknown) // Unknown defers creation
}
