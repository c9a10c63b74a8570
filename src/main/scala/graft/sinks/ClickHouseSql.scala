package graft.sinks

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import graft.types.{CHColumn, CHType}

/** ClickHouse SQL statement generation for the live sink (SURVEY.md sec 2.5
  * K1/K2): batched `INSERT INTO db.t (cols) VALUES(…), (…)` and
  * `ALTER TABLE db.t DELETE WHERE (pk = …) OR …`, with the reference's
  * value rendering and escaping rules
  * (reference: `src/adapter/mod.rs:143-255`, value dispatch
  * `src/adapter/clickhouse.rs:126-158`, escapes
  * `src/adapter/postgres/pgoutput.rs:203-210`).
  *
  * Rendering is pure per row, so statement generation distributes: each
  * executor partition renders its own `batchSize`-row INSERTs
  * ([[insertStatements]] returns a Dataset of statements). Execution is
  * the caller's (a JDBC/HTTP client per partition in live mode; collected
  * and asserted in tests).
  *
  * K7 note: the reference doubles `?` to `??` to defeat its HTTP client's
  * parameter binding (reference: `src/adapter/clickhouse.rs:222-232`).
  * That quirk belongs to that specific client; with JDBC prepared
  * statements or the HTTP interface it must NOT be applied — recorded
  * here so a live-sink implementation doesn't reintroduce it.
  */
object ClickHouseSql {

  /** String escape, exactly the reference's replace chain (order matters:
    * quotes first, then backslashes). */
  def escapeString(s: String): String =
    s.replace("'", "''")
      .replace("\\", "\\\\")
      .replace("\n", "\\n")
      .replace("\r", "\\r")
      .replace("\u0000", "\\0")

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  /** Render one Spark value into ClickHouse SQL text for the target type.
    * NULL into a Nullable target renders NULL; into a non-nullable target
    * it renders the type's default (0 / 0.0 / FALSE / '' / now-less epoch),
    * mirroring the reference's short-circuit (P14). */
  def renderValue(v: Any, chType: CHType): String = {
    val inner = chType.stripNullable
    if (v == null) {
      if (chType.isNullable) "NULL"
      else inner match {
        case CHType.Float32 | CHType.Float64 => "0"
        case CHType.Bool => "FALSE"
        case CHType.CHStr | CHType.FixedString(_) | CHType.UUID | CHType.Unknown => "''"
        case CHType.CHDate | CHType.Date32 => "toDate('1970-01-01')"
        case CHType.CHDateTime(_) | CHType.DateTime64(_, _) => "toDateTime('1970-01-01 00:00:00')"
        case CHType.CHTime | CHType.Time64(_) => "'00:00:00'"
        case CHType.CHArray(_) => "[]"
        case _ => "0"
      }
    } else inner match {
      case CHType.Bool =>
        if (v.asInstanceOf[Boolean]) "TRUE" else "FALSE"
      // Time maps to Spark StringType — must render QUOTED (an unquoted
      // 05:16:08 is malformed SQL); same escape rules as strings
      case CHType.CHStr | CHType.FixedString(_) | CHType.UUID | CHType.Unknown |
          CHType.CHTime | CHType.Time64(_) =>
        s"'${escapeString(v.toString)}'"
      case CHType.CHDate | CHType.Date32 =>
        val d = v match {
          case d: java.sql.Date => DateFmt.format(d.toLocalDate)
          case d: java.time.LocalDate => DateFmt.format(d)
          case other => other.toString
        }
        s"toDate('$d')"
      case CHType.CHDateTime(_) | CHType.DateTime64(_, _) =>
        val t = v match {
          case t: java.sql.Timestamp => TsFmt.format(t.toInstant)
          case t: java.time.Instant => TsFmt.format(t)
          case t: java.time.LocalDateTime => TsFmt.format(t.toInstant(ZoneOffset.UTC))
          case other => other.toString
        }
        s"toDateTime('$t')"
      case CHType.CHArray(el) =>
        val elems = v match {
          case s: scala.collection.Seq[_] => s.toSeq
          case a: Array[_] => a.toSeq
        }
        elems.map(e => renderValue(e, el)).mkString("[", ", ", "]")
      case _ => v.toString // all numeric families + Decimal
    }
  }

  /** One batched INSERT, byte-compatible with the reference's format
    * (`INSERT INTO db.t (c1, c2) VALUES(a,b), (c,d)` — no space after
    * VALUES, rows joined ", ", values joined ","). */
  def insertQuery(
      database: String, table: String,
      columns: Seq[CHColumn], rows: Seq[Row],
      maskColumns: Set[String] = Set.empty): String = {
    if (rows.isEmpty) return ""
    val header = s"INSERT INTO $database.$table " +
      columns.map(_.name).mkString("(", ", ", ")") + " VALUES"
    // one schema lookup per batch, not per row×column — the rows of a
    // batch share a schema and this is the hot rendering path
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

  /** One DELETE mutation over the PK columns
    * (`ALTER TABLE db.t DELETE WHERE (pk = 1) OR (pk = 2)`). */
  def deleteQuery(
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
    s"ALTER TABLE $database.$table DELETE WHERE " + conditions.mkString(" OR ")
  }

  /** Distributed statement generation: each partition renders its own
    * `batchSize`-row INSERT statements (the reference's copy_batch_size =
    * 100,000 — `src/config.rs:181-184`). The DataFrame should already be
    * aligned/masked/deduped (P1/P2/A1). */
  def insertStatements(
      df: DataFrame, database: String, table: String,
      columns: Seq[CHColumn], batchSize: Int = 100000,
      maskColumns: Set[String] = Set.empty,
      dialect: SqlDialect = ClickHouseDialect): Dataset[String] = {
    val cols = columns // serializable capture
    df.mapPartitions { rows =>
      rows.grouped(batchSize).map(batch =>
        dialect.insertQuery(database, table, cols, batch.toSeq, maskColumns))
    }(Encoders.STRING)
  }
}
