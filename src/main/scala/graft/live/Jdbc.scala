package graft.live

import java.sql.{Connection, DriverManager, ResultSet, Types}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Connection coordinates for a live JDBC endpoint — serializable so
  * executors can open their own connections for per-partition statement
  * execution (the one piece of the reference's client model that must NOT
  * be a shared driver object).
  *
  * The reference holds one client per endpoint for the pipe's lifetime
  * (PG pool: `src/adapter/postgres.rs:55-58`; CH HTTP client:
  * `src/adapter/clickhouse.rs:95-124`; Mongo: `src/adapter/mongodb.rs:39-61`).
  * Driver-side we mirror that with a single long-lived [[JdbcClient]];
  * executor-side each partition opens/closes its own.
  *
  * @param queryTimeoutMillis per-statement timeout; 0 = none. This is the
  *   live realization of `peek_changes_timeout_millis`
  *   (reference: `src/config.rs:151-154`).
  */
case class JdbcConnInfo(
    url: String,
    user: String = "",
    password: String = "",
    driver: Option[String] = None,
    queryTimeoutMillis: Long = 0L
) {
  def connect(): Connection = {
    driver.foreach(Class.forName)
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    DriverManager.getConnection(url, props)
  }
}

/** A single long-lived JDBC connection with the three verbs the reference's
  * adapters expose: `ping`, `execute_query` (no result), and a row-returning
  * query (reference: `src/adapter/clickhouse.rs:161-232` `ping`/
  * `execute_query`, `src/adapter/postgres.rs:787-829` peek/advance).
  *
  * Driver-side by design: the CDC peek protocol is inherently a single
  * ordered conversation with one replication slot — the parallelism belongs
  * to what happens AFTER the peek (decode, cast, route all run distributed),
  * and each peek is bounded by `peek_changes_limit` (65,536 default), so the
  * driver never holds more than one bounded batch.
  */
class JdbcClient(info: JdbcConnInfo) extends AutoCloseable {
  private var connOpt: Option[Connection] = None

  private def conn: Connection = synchronized {
    connOpt match {
      case Some(c) if !c.isClosed => c
      case _ =>
        val c = info.connect()
        connOpt = Some(c)
        c
    }
  }

  /** Liveness probe (reference: `clickhouse.rs:161-188` sends SELECT 1). */
  def ping(): Boolean =
    try conn.isValid(5)
    catch { case _: Exception => false }

  private def applyTimeout(st: java.sql.Statement): Unit =
    if (info.queryTimeoutMillis > 0)
      st.setQueryTimeout(math.max(1, (info.queryTimeoutMillis / 1000L).toInt))

  /** Execute a statement, discarding any result (DDL / INSERT / DELETE /
    * TRUNCATE — the sink verb). */
  def execute(sql: String): Unit = {
    val st = conn.createStatement()
    try { applyTimeout(st); st.execute(sql); () }
    finally st.close()
  }

  /** Row-returning query → (schema, rows). Bounded use only (catalog reads,
    * CDC peeks ≤ peek limit); never a table scan. */
  def query(sql: String): (StructType, Vector[Row]) = {
    val st = conn.createStatement()
    try {
      applyTimeout(st)
      val rs = st.executeQuery(sql)
      try {
        val schema = JdbcRows.schemaOf(rs)
        val out = ArrayBuffer.empty[Row]
        while (rs.next()) out += JdbcRows.rowOf(rs, schema)
        (schema, out.toVector)
      } finally rs.close()
    } finally st.close()
  }

  /** Single-value convenience (emptiness probes, row estimates —
    * reference: `clickhouse.rs:234-253`, `postgres.rs:760-785`). */
  def queryScalar(sql: String): Option[Any] =
    query(sql)._2.headOption.map(_.get(0))

  /** Query → distributed DataFrame. The driver materializes ≤ one peeked
    * batch (bounded by the SQL's own LIMIT), then hands it to Spark. */
  def queryDf(spark: SparkSession, sql: String): DataFrame = {
    val (schema, rows) = query(sql)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Catalog introspection through JDBC metadata (S5) — the portable
    * counterpart of the reference's `information_schema` reads
    * (`src/adapter/postgres.rs:696-758`). Works on any compliant driver
    * (Derby in specs; PG/ClickHouse live). */
  def tableColumns(schemaPattern: Option[String], table: String): Seq[(String, org.apache.spark.sql.types.DataType, Boolean)] = {
    val md = conn.getMetaData
    val rs = md.getColumns(null, schemaPattern.orNull, table, null)
    try {
      val out = ArrayBuffer.empty[(Int, (String, org.apache.spark.sql.types.DataType, Boolean))]
      while (rs.next()) {
        out += ((rs.getInt("ORDINAL_POSITION"), (
          rs.getString("COLUMN_NAME").toLowerCase,
          JdbcRows.sparkType(rs.getInt("DATA_TYPE"),
            math.max(rs.getInt("COLUMN_SIZE"), 1),
            math.max(rs.getInt("DECIMAL_DIGITS"), 0)),
          rs.getInt("NULLABLE") != java.sql.ResultSetMetaData.columnNoNulls)))
      }
      out.sortBy(_._1).map(_._2).toSeq
    } finally rs.close()
  }

  /** Column metadata of exactly `database`.`table`, with COLUMN_NAME case
    * PRESERVED (unlike [[tableColumns]]) — required when the schema is
    * data-derived (Mongo field names are case-significant). Correctness
    * hardening over a bare `getColumns` probe:
    *
    *  - JDBC treats `_`/`%` in name arguments as SEARCH PATTERNS, so the
    *    result set is post-filtered to exact (case-insensitive) TABLE_NAME
    *    matches — `user_events` no longer matches `user1events`;
    *  - the database scopes the lookup (a same-named table in another
    *    schema must NOT satisfy the probe): tried as catalog and as
    *    schema (drivers disagree — Derby: schema, ClickHouse: catalog) in
    *    stored-case/upper/lower variants. There is deliberately NO
    *    unscoped fallback — a same-named table in another schema must
    *    report "absent" (loud CREATE failure), not silently satisfy
    *    initialize. A row whose TABLE_CAT and TABLE_SCHEM are BOTH null
    *    (the driver exposes neither) carries no scope evidence and is
    *    accepted, so such drivers don't mis-report an existing table as
    *    absent;
    *  - table-name case variants cover case-folding engines (Derby
    *    uppercases unquoted identifiers).
    *
    * Empty result = the table does not exist (the initialize-phase
    * CREATE-vs-drift decision point). */
  def columnsOf(database: Option[String], table: String): Seq[(String, org.apache.spark.sql.types.DataType, Boolean)] = {
    val md = conn.getMetaData
    // the PATTERN arguments only narrow the server-side read; row
    // ACCEPTANCE is decided by post-filters (drivers disagree on — and
    // Derby outright ignores — the catalog argument). A row belongs to
    // the probed table iff TABLE_NAME matches exactly and, when a
    // database is configured, that database names the row's catalog OR
    // schema. No unscoped fallback when scoped: a same-named table in
    // another schema must report "absent" (loud CREATE failure), not
    // silently satisfy initialize.
    def rowInDatabase(rs: ResultSet): Boolean = database.forall { db =>
      val cat = rs.getString("TABLE_CAT")
      val schem = rs.getString("TABLE_SCHEM")
      // null-CAT + null-SCHEM: the driver exposes no scope for the row —
      // accept it (no evidence AGAINST the configured database) rather
      // than reporting an existing table absent and CREATE-ing a failure
      (cat == null && schem == null) ||
        db.equalsIgnoreCase(cat) || db.equalsIgnoreCase(schem)
    }
    def attempt(catalog: String, schemaPattern: String, tablePattern: String): Seq[(Int, (String, org.apache.spark.sql.types.DataType, Boolean))] = {
      val rs = md.getColumns(catalog, schemaPattern, tablePattern, null)
      try {
        val out = ArrayBuffer.empty[(Int, (String, org.apache.spark.sql.types.DataType, Boolean))]
        while (rs.next()) {
          if (table.equalsIgnoreCase(rs.getString("TABLE_NAME")) && rowInDatabase(rs))
            out += ((rs.getInt("ORDINAL_POSITION"), (
              rs.getString("COLUMN_NAME"),
              JdbcRows.sparkType(rs.getInt("DATA_TYPE"),
                math.max(rs.getInt("COLUMN_SIZE"), 1),
                math.max(rs.getInt("DECIMAL_DIGITS"), 0)),
              rs.getInt("NULLABLE") != java.sql.ResultSetMetaData.columnNoNulls)))
        }
        out.toSeq
      } finally rs.close()
    }
    val tableVariants = Seq(table, table.toUpperCase, table.toLowerCase).distinct
    val attempts = database match {
      case Some(db) =>
        val dbVariants = Seq(db, db.toUpperCase, db.toLowerCase).distinct
        for {
          tv <- tableVariants
          (cat, sp) <- dbVariants.map(v => (v, null: String)) ++
            dbVariants.map(v => (null: String, v))
        } yield () => attempt(cat, sp, tv)
      case None => tableVariants.map(tv => () => attempt(null, null, tv))
    }
    attempts.iterator.map(_.apply()).find(_.nonEmpty).getOrElse(Seq.empty)
      .sortBy(_._1).map(_._2)
  }

  /** COPY-based snapshot stream (S1 — the reference's streaming snapshot,
    * `src/adapter/postgres.rs:832-910`): issue
    * `COPY (SELECT "c1", … FROM tbl) TO STDOUT` and return the raw text
    * chunks for [[graft.sources.CopySource.snapshot]] (D6/D7 chunked
    * parse → aligned typed frame). Returns None when the endpoint has no
    * COPY support (any non-Postgres driver) — callers fall back to the
    * partitioned `spark.read.jdbc` scan. Implemented reflectively against
    * pgjdbc's public `CopyManager` API (same pattern as the reflective
    * Mongo transport in [[graft.mongo.LiveMongo]]) so the library carries
    * no compile-time Postgres dependency. */
  def copyOut[A](table: String, columns: Seq[String])(
      consume: Iterator[Array[Byte]] => A): Option[A] =
    copyOutSql(JdbcClient.copySql(table, columns)).map { s =>
      // bracket: the COPY conversation runs on the SHARED long-lived
      // connection, and a consumer that throws (or returns) mid-stream
      // would otherwise leave it stuck in COPY_OUT protocol state —
      // every later statement (catalog queries, the peek loop) fails.
      // The reference avoids this with a dedicated COPY connection
      // (src/adapter/postgres.rs:832-910); here the abort hook cancels
      // the operation so the one connection returns to command mode.
      var ok = false
      try { val a = consume(s.chunks); ok = true; a }
      finally {
        if (!ok) s.abort()
        // drained successfully ⇒ hasNext already saw the end marker and
        // is side-effect-free; an undrained-but-returned consumer still
        // holds the protocol open ⇒ cancel. The probe itself can pull
        // one more chunk from the live stream and may THROW on a
        // mid-stream server failure — best-effort, like the abort hook,
        // so a broken end-of-stream can't override a completed consume.
        else try { if (s.chunks.hasNext) s.abort() }
        catch { case _: Exception => try s.abort() catch { case _: Exception => () } }
      }
    }

  /** Transport seam behind [[copyOut]]: execute one COPY … TO STDOUT
    * statement, yielding its chunk stream plus the cancel hook. Overridable
    * by executable test endpoints (the pgstub parses and serves the same
    * statement text; its abort is a no-op — no protocol state to free). */
  protected def copyOutSql(sql: String): Option[JdbcClient.CopyStream] = {
    // reflective calls wrap the server's real failure (a dropped table,
    // a reset connection, a permission error) in
    // InvocationTargetException — rethrow the CAUSE so callers see the
    // SQLException, not reflection noise
    def unwrapping[A](f: => A): A =
      try f catch {
        case e: java.lang.reflect.InvocationTargetException
            if e.getCause != null => throw e.getCause
      }
    try {
      val bc = Class.forName("org.postgresql.core.BaseConnection")
      val c = conn
      val base: AnyRef =
        if (bc.isInstance(c)) c
        else if (c.isWrapperFor(bc)) c.unwrap(bc).asInstanceOf[AnyRef]
        else return None
      val cmCls = Class.forName("org.postgresql.copy.CopyManager")
      val cm = unwrapping(cmCls.getConstructor(bc).newInstance(base))
      val op = unwrapping(
        cmCls.getMethod("copyOut", classOf[String]).invoke(cm, sql))
      val read = op.getClass.getMethod("readFromCopy")
      val isActive = op.getClass.getMethod("isActive")
      val cancel = op.getClass.getMethod("cancelCopy")
      // one COPY conversation, pulled serially on the driver; null chunk
      // = stream end. Mid-stream failures surface from inside the
      // iterator (the pull site) — also unwrapped to the real cause.
      Some(new JdbcClient.CopyStream(
        Iterator
          .continually(unwrapping(read.invoke(op).asInstanceOf[Array[Byte]]))
          .takeWhile(_ != null),
        () =>
          // best-effort: the point is freeing the connection from
          // COPY_OUT; a cancel failing because the server already
          // dropped the conversation is the same end state
          try { if (isActive.invoke(op).asInstanceOf[Boolean])
            unwrapping(cancel.invoke(op)) }
          catch { case _: Exception => () }))
    } catch {
      // driver on the classpath but not Postgres-shaped → no COPY
      case _: ClassNotFoundException => None
      case _: NoClassDefFoundError   => None
    }
  }

  /** Primary-key column names, in key order (S5 PK membership —
    * `DatabaseMetaData.getPrimaryKeys` is the portable PK query). */
  def primaryKeys(schemaPattern: Option[String], table: String): Seq[String] = {
    val rs = conn.getMetaData.getPrimaryKeys(null, schemaPattern.orNull, table)
    try {
      val out = ArrayBuffer.empty[(Short, String)]
      while (rs.next()) out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME").toLowerCase))
      out.sortBy(_._1).map(_._2).toSeq
    } finally rs.close()
  }

  override def close(): Unit = synchronized {
    connOpt.foreach(c => if (!c.isClosed) c.close())
    connOpt = None
  }
}

object JdbcClient {
  /** An open COPY … TO STDOUT conversation: the chunk stream plus the
    * cancel hook that frees the connection from COPY_OUT protocol state
    * when the consumer stops before the stream ends. */
  final class CopyStream(
      val chunks: Iterator[Array[Byte]], abort0: () => Unit) {
    def abort(): Unit = abort0()
  }

  /** The COPY snapshot statement (reference issues the same shape,
    * `src/adapter/postgres.rs:848-858`): explicit quoted column list so
    * the text rows land in the target's declared order, wrapped SELECT so
    * the statement stays valid for views and case-folded names. */
  def copySql(table: String, columns: Seq[String]): String =
    s"""COPY (SELECT ${columns.map(c => s""""$c"""").mkString(", ")} FROM $table) TO STDOUT"""
}

/** JDBC ↔ Spark row/schema conversion for the bounded driver-side reads. */
object JdbcRows {

  def sparkType(jdbcType: Int, precision: Int, scale: Int): DataType =
    jdbcType match {
      case Types.BIT | Types.BOOLEAN       => BooleanType
      case Types.TINYINT | Types.SMALLINT  => ShortType
      case Types.INTEGER                   => IntegerType
      case Types.BIGINT                    => LongType
      case Types.REAL                      => FloatType
      case Types.FLOAT | Types.DOUBLE      => DoubleType
      case Types.NUMERIC | Types.DECIMAL   =>
        DecimalType(math.min(math.max(precision, 1), 38), math.min(scale, 37))
      case Types.DATE                      => DateType
      case Types.TIME | Types.TIMESTAMP | Types.TIMESTAMP_WITH_TIMEZONE => TimestampType
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => BinaryType
      case _                               => StringType
    }

  def schemaOf(rs: ResultSet): StructType = {
    val md = rs.getMetaData
    StructType((1 to md.getColumnCount).map { i =>
      StructField(
        md.getColumnLabel(i).toLowerCase,
        sparkType(md.getColumnType(i), md.getPrecision(i), md.getScale(i)),
        nullable = md.isNullable(i) != java.sql.ResultSetMetaData.columnNoNulls)
    })
  }

  def rowOf(rs: ResultSet, schema: StructType): Row = {
    val values = schema.fields.zipWithIndex.map { case (f, i) =>
      val v: Any = f.dataType match {
        case BooleanType => rs.getBoolean(i + 1)
        case ShortType   => rs.getShort(i + 1)
        case IntegerType => rs.getInt(i + 1)
        case LongType    => rs.getLong(i + 1)
        case FloatType   => rs.getFloat(i + 1)
        case DoubleType  => rs.getDouble(i + 1)
        case _: DecimalType => rs.getBigDecimal(i + 1)
        case DateType    => rs.getDate(i + 1)
        case TimestampType => rs.getTimestamp(i + 1)
        case BinaryType  =>
          rs.getObject(i + 1) match {
            case null => null
            case b: java.sql.Blob => b.getBytes(1, b.length().toInt)
            case a: Array[Byte]   => a
            case other            => other.toString.getBytes("UTF-8")
          }
        case _ => rs.getString(i + 1)
      }
      if (rs.wasNull()) null else v
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values.toArray[Any], schema)
  }
}

/** Executor-side statement execution: each partition of a rendered-statement
  * Dataset opens its own connection, executes its statements in partition
  * order, and closes. The driver never sees the statement text — only the
  * per-partition counts come back (as the action's result).
  *
  * Use for the INSERT stage, which is order-free ACROSS statements within a
  * batch (the reference also splits it into independent `copy_batch_size`
  * chunks — `src/pipes/postgres.rs:181-216`); TRUNCATE/DELETE stay
  * driver-sequenced because their position in the batch is a correctness
  * contract (SURVEY.md sec 3 EP3 write order).
  */
object JdbcExec {
  def executePartitions(statements: org.apache.spark.sql.Dataset[String], info: JdbcConnInfo): Long = {
    import statements.sparkSession.implicits._
    statements.filter(_.nonEmpty).mapPartitions { stmts =>
      if (stmts.isEmpty) Iterator.single(0L)
      else {
        val conn = info.connect()
        try {
          var n = 0L
          val st = conn.createStatement()
          try stmts.foreach { s => st.execute(s); n += 1 }
          finally st.close()
          Iterator.single(n)
        } finally conn.close()
      }
    }.reduce(_ + _)
  }
}
