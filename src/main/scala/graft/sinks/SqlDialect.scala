package graft.sinks

import org.apache.spark.sql.Row
import graft.types.{CHColumn, CHType}

/** Statement-text dialect for the live sink. The reference targets exactly
  * one sink dialect — ClickHouse SQL rendered as text and POSTed over HTTP
  * (reference: `src/adapter/clickhouse.rs:126-232`) — but the *executing*
  * transport here is generic JDBC, so the statement text is the only
  * endpoint-specific part. [[ClickHouseDialect]] is byte-compatible with
  * the reference's rendering (golden-tested in ClickHouseSqlSpec);
  * [[AnsiDialect]] renders the same statement sequence in portable ANSI SQL
  * so the full live path (peek → render → execute → verify) is
  * integration-testable against any embedded JDBC engine (Derby in specs).
  *
  * A dialect must be Serializable: INSERT rendering runs on executors
  * ([[ClickHouseSql.insertStatements]]).
  */
trait SqlDialect extends Serializable {

  def renderValue(v: Any, chType: CHType): String

  /** One batched multi-row INSERT. Default format matches the reference
    * (`INSERT INTO db.t (c1, c2) VALUES(a,b), (c,d)` — no space after
    * VALUES), which is also valid ANSI. One schema lookup per batch (the
    * rows share a schema; this is the hot rendering path). */
  def insertQuery(
      database: String, table: String,
      columns: Seq[CHColumn], rows: Seq[Row],
      maskColumns: Set[String] = Set.empty): String = {
    if (rows.isEmpty) return ""
    val header = s"INSERT INTO $database.$table " +
      columns.map(_.name).mkString("(", ", ", ")") + " VALUES"
    val fieldIdx = rows.head.schema.fieldNames.zipWithIndex.toMap
    val colIdx = columns.map(c =>
      (c, if (maskColumns.contains(c.name)) -1 else fieldIdx.getOrElse(c.name, -1)))
    val rendered = rows.map { row =>
      colIdx.map { case (c, idx) =>
        renderValue(if (idx < 0) null else row.get(idx), c.chType)
      }.mkString("(", ",", ")")
    }
    header + rendered.mkString(", ")
  }

  /** One DELETE over the PK columns for a bounded chunk of keys. */
  def deleteQuery(
      database: String, table: String,
      columns: Seq[CHColumn], keyRows: Seq[Row]): String

  /** Whether K1 upserts need the batch's upsert KEYS deleted at the target
    * before the INSERT. ClickHouse's insert-as-append is an upsert by
    * design (ReplacingMergeTree collapses on the sort key — reference:
    * `src/pipes/postgres.rs:391-432` just renders INSERTs), so re-sending
    * a key is harmless there. A generic ANSI endpoint is NOT like that: a
    * plain INSERT for a key synced in an earlier batch violates the PK
    * constraint (deterministic write failure → endless replay) or
    * silently duplicates rows without one. Dialects answering `true` get
    * a delete-matching-keys pass rendered BEFORE the batch's inserts,
    * which restores both upsert semantics and replay idempotence. */
  def upsertRequiresDeleteFirst: Boolean = false

  def truncateQuery(database: String, table: String): String

  /** K6 emptiness probe: a scalar query whose result is truthy iff the
    * table has at least one row — O(1), never a COUNT(*) table scan
    * (reference: `src/adapter/clickhouse.rs:234-253`). */
  def nonEmptyProbe(database: String, table: String): String

  /** K4: CREATE TABLE for the initialize phase
    * (reference: `src/adapter/mod.rs:53-123`). */
  def createTableQuery(
      database: String, table: String, columns: Seq[CHColumn],
      options: graft.ddl.TableOptions = graft.ddl.TableOptions(),
      tableComment: String = ""): String

  /** K5: ALTER TABLE … ADD COLUMN for schema-drift reconciliation
    * (reference: `src/adapter/mod.rs:125-141`). */
  def addColumnQuery(database: String, table: String, column: CHColumn): String
}

object SqlDialect {
  /** Interpret a probe scalar across JDBC type mappings. */
  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case n: Number => n.longValue != 0L
    case s: String => s == "1" || s.equalsIgnoreCase("true")
    case other => other.toString == "1"
  }
}

/** The reference's dialect: delegates to [[ClickHouseSql]] so the golden
  * byte-compatibility specs keep pinning a single implementation. */
object ClickHouseDialect extends SqlDialect {
  override def renderValue(v: Any, chType: CHType): String =
    ClickHouseSql.renderValue(v, chType)
  override def insertQuery(
      database: String, table: String, columns: Seq[CHColumn],
      rows: Seq[Row], maskColumns: Set[String]): String =
    ClickHouseSql.insertQuery(database, table, columns, rows, maskColumns)
  override def deleteQuery(
      database: String, table: String, columns: Seq[CHColumn],
      keyRows: Seq[Row]): String =
    ClickHouseSql.deleteQuery(database, table, columns, keyRows)
  override def truncateQuery(database: String, table: String): String =
    graft.ddl.Ddl.truncateQuery(database, table)
  override def nonEmptyProbe(database: String, table: String): String =
    graft.sources.CatalogSql.chTableNonEmpty(database, table)
  override def createTableQuery(
      database: String, table: String, columns: Seq[CHColumn],
      options: graft.ddl.TableOptions, tableComment: String): String =
    graft.ddl.Ddl.createTableQuery(database, table, columns, options, tableComment)
  override def addColumnQuery(
      database: String, table: String, column: CHColumn): String =
    graft.ddl.Ddl.addColumnQuery(database, table, column)
}

/** Portable ANSI SQL dialect for generic JDBC endpoints: standard string
  * escaping (only `''` — backslash is NOT an escape in ANSI string
  * literals), `TIMESTAMP '…'` / `DATE '…'` literals, `DELETE FROM` instead
  * of ClickHouse's `ALTER TABLE … DELETE` mutation. Same statement
  * *sequence* contract as the reference (truncate → inserts → deletes). */
object AnsiDialect extends SqlDialect {
  import java.time.format.DateTimeFormatter
  import java.time.ZoneOffset

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
  private val DateFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  def escapeString(s: String): String = s.replace("'", "''")

  override def renderValue(v: Any, chType: CHType): String = {
    val inner = chType.stripNullable
    if (v == null) {
      if (chType.isNullable) "NULL"
      else inner match {
        case CHType.Float32 | CHType.Float64 => "0"
        case CHType.Bool => "FALSE"
        case CHType.CHStr | CHType.FixedString(_) | CHType.UUID | CHType.Unknown => "''"
        case CHType.CHDate | CHType.Date32 => "DATE '1970-01-01'"
        case CHType.CHDateTime(_) | CHType.DateTime64(_, _) =>
          "TIMESTAMP '1970-01-01 00:00:00'"
        case CHType.CHTime | CHType.Time64(_) => "TIME '00:00:00'"
        case _ => "0"
      }
    } else inner match {
      case CHType.Bool =>
        if (v.asInstanceOf[Boolean]) "TRUE" else "FALSE"
      case CHType.CHStr | CHType.FixedString(_) | CHType.UUID | CHType.Unknown =>
        s"'${escapeString(v.toString)}'"
      // Time maps to Spark StringType — an unquoted 05:16:08 is malformed
      // SQL; ANSI has a TIME literal form (unlike ClickHouse)
      case CHType.CHTime | CHType.Time64(_) =>
        s"TIME '${escapeString(v.toString)}'"
      case CHType.CHDate | CHType.Date32 =>
        val d = v match {
          case d: java.sql.Date => DateFmt.format(d.toLocalDate)
          case d: java.time.LocalDate => DateFmt.format(d)
          case other => other.toString
        }
        s"DATE '$d'"
      case CHType.CHDateTime(_) | CHType.DateTime64(_, _) =>
        val t = v match {
          case t: java.sql.Timestamp => TsFmt.format(t.toInstant)
          case t: java.time.Instant => TsFmt.format(t)
          case t: java.time.LocalDateTime => TsFmt.format(t.toInstant(ZoneOffset.UTC))
          case other => other.toString
        }
        s"TIMESTAMP '$t'"
      case CHType.CHArray(el) =>
        // no portable array literal; render as a CH-style string
        val elems = v match {
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_] => a.toSeq
        }
        s"'${escapeString(elems.map(e => renderValue(e, el)).mkString("[", ", ", "]"))}'"
      case _ => v.toString
    }
  }

  override def deleteQuery(
      database: String, table: String,
      columns: Seq[CHColumn], keyRows: Seq[Row]): String = {
    if (keyRows.isEmpty) return ""
    val pks = columns.filter(_.isPrimaryKey)
    // zero PK columns would render an empty predicate group — malformed
    // SQL that the endpoint rejects forever; fail with a real message
    require(pks.nonEmpty,
      s"deleteQuery for $database.$table: no primary-key columns to match on")
    val fieldIdx = keyRows.head.schema.fieldNames.zipWithIndex.toMap
    val pkIdx = pks.map(c => (c, fieldIdx.getOrElse(c.name, -1)))
    val conditions = keyRows.map { row =>
      pkIdx.map { case (c, idx) =>
        s"${c.name} = ${renderValue(if (idx < 0) null else row.get(idx), c.chType)}"
      }.mkString("(", " AND ", ")")
    }
    s"DELETE FROM $database.$table WHERE " + conditions.mkString(" OR ")
  }

  override def truncateQuery(database: String, table: String): String =
    s"TRUNCATE TABLE $database.$table"

  override def nonEmptyProbe(database: String, table: String): String =
    s"SELECT COUNT(*) FROM (SELECT 1 AS one FROM $database.$table FETCH FIRST 1 ROWS ONLY) p"

  /** ANSI upsert = delete the batch's keys, then insert: portable MERGE
    * support is too uneven across JDBC endpoints, and delete-then-insert
    * inside one batch gives identical final state under the pipe's
    * last-wins dedup. */
  override def upsertRequiresDeleteFirst: Boolean = true

  /** Target type → portable SQL type. Strings/UUIDs/arrays land in a wide
    * VARCHAR (arrays render as CH-style strings — see [[renderValue]]);
    * DECIMAL capped at 31 digits (the least common denominator across
    * embedded engines — Derby's max precision). */
  def ansiType(t: CHType): String = t.stripNullable match {
    case CHType.Int8 | CHType.Int16 | CHType.UInt8       => "SMALLINT"
    case CHType.Int32 | CHType.UInt16                    => "INTEGER"
    case CHType.Int64 | CHType.UInt32 | CHType.UInt64 |
         CHType.Int128 | CHType.UInt128 | CHType.Int256 |
         CHType.UInt256                                   => "BIGINT"
    case CHType.Float32                                   => "REAL"
    case CHType.Float64                                   => "DOUBLE"
    case CHType.Bool                                      => "BOOLEAN"
    case CHType.FixedString(n)                            => s"CHAR($n)"
    case CHType.CHDecimal                                 => "DECIMAL(31,8)"
    case CHType.CHDate | CHType.Date32                    => "DATE"
    case CHType.CHTime | CHType.Time64(_)                 => "TIME"
    case CHType.CHDateTime(_) | CHType.DateTime64(_, _)   => "TIMESTAMP"
    case _                                                => "VARCHAR(32672)"
  }

  /** DDL identifiers render UNQUOTED (quoting lowercase names would make
    * them unreachable from the unquoted DML this dialect also renders,
    * and break against natively-created tables on case-folding engines) —
    * so they must BE valid unquoted identifiers. Column names can be
    * data-derived (Mongo document fields), and interpolating an arbitrary
    * string into DDL is an injection surface: reject anything else with a
    * clean error instead of emitting broken or hostile SQL. */
  private val SafeIdent = "[A-Za-z_][A-Za-z0-9_]*".r
  private def checkIdent(name: String, what: String): String = {
    require(SafeIdent.matches(name),
      s"$what '$name' is not a valid unquoted SQL identifier; " +
        "rename or exclude it (ANSI DDL renders identifiers unquoted)")
    name
  }

  /** Portable CREATE TABLE: column list + PRIMARY KEY clause. The
    * ClickHouse-specific clauses (engine, granularity, comments) have no
    * ANSI rendering and are dropped — the *schema* is the contract
    * (reference: `src/adapter/mod.rs:53-123`). */
  override def createTableQuery(
      database: String, table: String, columns: Seq[CHColumn],
      options: graft.ddl.TableOptions, tableComment: String): String = {
    val colDefs = columns.map { c =>
      s"${checkIdent(c.name, "column name")} ${ansiType(c.chType)}" +
        (if (c.chType.isNullable) "" else " NOT NULL")
    }
    val pks = columns.filter(_.isPrimaryKey).map(_.name)
    val pkClause = if (pks.isEmpty) "" else s", PRIMARY KEY (${pks.mkString(", ")})"
    s"CREATE TABLE $database.$table (${colDefs.mkString(", ")}$pkClause)"
  }

  /** Drift-added columns are always nullable: rows synced before the
    * column existed have no value for it, and ANSI engines reject adding
    * NOT NULL without a default to a non-empty table. */
  override def addColumnQuery(
      database: String, table: String, column: CHColumn): String =
    s"ALTER TABLE $database.$table ADD COLUMN " +
      s"${checkIdent(column.name, "column name")} ${ansiType(column.chType)}"
}
