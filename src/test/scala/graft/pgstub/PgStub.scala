package graft.pgstub

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap, LinkedHashSet}
import graft.decode.{PgOutputEncoder, PgValue}
import graft.live.PgLsn

/** Minimal EXECUTABLE PostgreSQL endpoint for tests — the replication
  * counterpart of [[graft.chstub.ChStubEngine]] (ClickHouse) and
  * [[graft.mongostub.StubDriver]] (Mongo): every statement the live-PG
  * pipe emits is PARSED with a strict lexer/recursive-descent grammar and
  * EXECUTED against an in-memory catalog + WAL, instead of being
  * string-compared against the constants that produced it.
  *
  * Surfaces executed (reference semantics:
  * `/root/reference/src/pipes/postgres.rs:94-517`,
  * `/root/reference/src/adapter/postgres.rs:533-910`):
  *
  *  - introspection SELECTs: the `information_schema.columns` +
  *    `table_constraints`/`key_column_usage` EXISTS + `pg_description`
  *    LEFT JOINs of [[graft.sources.CatalogSql.pgColumns]], the
  *    `pg_class`/`pg_namespace` relation-id join, `obj_description`
  *    comments, `reltuples` estimates — evaluated row-by-row against the
  *    catalog by a tiny relational engine (nested-loop joins, correlated
  *    EXISTS, COALESCE, `::regclass`/`::bigint` casts);
  *  - publication DDL: `CREATE PUBLICATION … FOR TABLE` /
  *    `ALTER PUBLICATION … ADD TABLE` parsed and applied; unknown tables,
  *    duplicate publications and duplicate members fail loudly;
  *  - replication slots: `pg_create_logical_replication_slot` (pgoutput
  *    plugin enforced), `pg_logical_slot_peek_binary_changes` as a
  *    set-returning FROM item (non-consuming: frames above the confirmed
  *    LSN, publication-filtered, bounded by the limit argument),
  *    `pg_replication_slot_advance` (monotone, bounded by the WAL end);
  *  - the COPY snapshot: `COPY (SELECT "c", … FROM s.t) TO STDOUT`
  *    parsed, rows serialized in PG text format (tab-delimited, `\N`
  *    nulls, C-style escapes) and chunked at arbitrary byte boundaries so
  *    the D6/D7 chunk-state parser is exercised for real.
  *
  * The WAL is populated by [[PgStubEngine.commit]], which both APPLIES
  * each change to the stored rows and appends Begin/Relation/DML/Commit
  * frames built with the repo's own [[PgOutputEncoder]] — so the COPY
  * snapshot and the CDC stream can never disagree about table state.
  *
  * The grammar is strict on purpose (the ChStub rationale): a malformed
  * emission — bad quoting, a missing cast, an option the function doesn't
  * take — fails the statement the way the real server would, instead of
  * slipping through a lenient regex.
  */
object PgStubEngine {

  // ------------------------------------------------------------ tokens
  sealed trait Tok
  case class Ident(s: String, quoted: Boolean = false) extends Tok
  case class Str(s: String) extends Tok
  case class Num(s: String) extends Tok
  case class Op(s: String) extends Tok

  private[pgstub] def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def err(msg: String) =
      throw new IllegalArgumentException(s"syntax error at char $i: $msg")
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        // standard_conforming_strings=on: '' is the ONLY escape; a
        // backslash is a literal byte (strict — the emitted SQL never
        // relies on E'…' escapes)
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed) {
          if (i >= n) err("unterminated string literal")
          sql.charAt(i) match {
            case '\'' if i + 1 < n && sql.charAt(i + 1) == '\'' =>
              sb.append('\''); i += 2
            case '\'' => closed = true; i += 1
            case ch => sb.append(ch); i += 1
          }
        }
        out += Str(sb.toString)
      } else if (c == '"') {
        val end = sql.indexOf('"', i + 1)
        if (end < 0) err("unterminated quoted identifier")
        out += Ident(sql.substring(i + 1, end), quoted = true)
        i = end + 1
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        out += Num(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_' ||
          sql.charAt(i) == '$')) i += 1
        out += Ident(sql.substring(start, i))
      } else if (c == ':' && i + 1 < n && sql.charAt(i + 1) == ':') {
        out += Op("::"); i += 2
      } else if ("(),.;=".indexOf(c) >= 0) {
        out += Op(c.toString); i += 1
      } else err(s"unexpected character '$c'")
    }
    out.result()
  }

  // --------------------------------------------------------------- AST
  private[pgstub] sealed trait Expr
  private[pgstub] case class Lit(v: Any) extends Expr
  private[pgstub] case class ColRef(qual: Option[String], name: String) extends Expr
  private[pgstub] case class EqE(l: Expr, r: Expr) extends Expr
  private[pgstub] case class AndE(terms: Seq[Expr]) extends Expr
  private[pgstub] case class InE(e: Expr, vals: Seq[Expr]) extends Expr
  private[pgstub] case class ExistsE(sel: Sel) extends Expr
  private[pgstub] case class Fn(name: String, args: Seq[Expr]) extends Expr
  private[pgstub] case class CastE(e: Expr, to: String) extends Expr

  private[pgstub] case class Item(e: Expr, alias: Option[String])
  private[pgstub] case class FromTable(
      qual: Option[String], name: String, alias: Option[String])
  private[pgstub] case class JoinSpec(leftOuter: Boolean, t: FromTable, on: Expr)
  private[pgstub] case class Sel(
      items: Seq[Item],
      from: Option[Either[FromTable, Fn]],
      joins: Seq[JoinSpec],
      where: Option[Expr],
      orderBy: Option[ColRef])

  /** One source-table column: name, PG udt name, nullability, PK
    * membership, optional comment. */
  case class Col(
      name: String, udt: String, nullable: Boolean, pk: Boolean,
      comment: String = "")

  /** A transactional change set entry for [[PgStubEngine.commit]]. */
  sealed trait Change { def schema: String; def table: String }
  case class Insert(schema: String, table: String, values: Seq[Option[String]])
      extends Change
  /** `toastCols` are encoded as pgoutput Unchanged ('u') with the FULL
    * before-image attached as an 'O' old tuple (REPLICA IDENTITY FULL
    * shape) — the decoder's D4 TOAST resolution is exercised for real. */
  case class Update(
      schema: String, table: String, values: Seq[Option[String]],
      toastCols: Set[String] = Set.empty) extends Change
  /** Key-only delete: the 'K' tuple carries PK values, other columns
    * null (the default replica-identity shape). `pkValues` is keyed by
    * column name. */
  case class Delete(schema: String, table: String, pkValues: Map[String, String])
      extends Change
  case class Truncate(schema: String, table: String) extends Change
}

final class PgStubEngine {
  import PgStubEngine._

  // ------------------------------------------------------------ state
  final class Table(
      val schema: String, val name: String, val oid: Long,
      val cols: IndexedSeq[Col], var comment: Option[String]) {
    /** Text-model rows, positional; None = SQL NULL. */
    val rows = new ArrayBuffer[IndexedSeq[Option[String]]]
    /** Planner estimate (`reltuples` is a float4 estimate, NOT a count);
      * negative = derive from the live row count. */
    var reltuples: Double = -1.0
    def colIndex(c: String): Int = {
      val i = cols.indexWhere(_.name == c)
      if (i < 0) throw new IllegalArgumentException(
        s"""column "$c" of relation "$name" does not exist""")
      i
    }
  }

  private final class Slot(val plugin: String) { var confirmed: Long = 0L }

  private case class WalEntry(
      lsn: Long, xid: Long, data: Array[Byte], rel: Option[Long])

  private val tables = new LinkedHashMap[(String, String), Table]
  private val nsOids = new LinkedHashMap[String, Long]
  private val publications = new LinkedHashMap[String, LinkedHashSet[(String, String)]]
  private val slots = new LinkedHashMap[String, Slot]
  private val wal = new ArrayBuffer[WalEntry]
  private var nextOid = 16384L
  private var nextLsn = 1L

  /** Every statement text the engine received, in arrival order — the
    * specs' ordering oracle (peek-before-advance, no re-CREATE, …). */
  val statements = new ArrayBuffer[String]
  /** Number of peek invocations served (each is one slot conversation). */
  var peeksServed: Int = 0

  def createTable(
      schema: String, name: String, cols: Seq[Col],
      comment: Option[String] = None, reltuples: Double = -1.0): Table =
    synchronized {
      require(!tables.contains((schema, name)), s"table $schema.$name exists")
      nsOids.getOrElseUpdate(schema, { nextOid += 1; nextOid })
      nextOid += 1
      val t = new Table(schema, name, nextOid, cols.toIndexedSeq, comment)
      t.reltuples = reltuples
      tables((schema, name)) = t
      t
    }

  def table(schema: String, name: String): Table =
    tables.getOrElse((schema, name), throw new IllegalArgumentException(
      s"""relation "$schema.$name" does not exist"""))

  /** Seed rows WITHOUT WAL traffic — pre-slot history, visible only to
    * the COPY snapshot (the real-server shape: rows older than the slot
    * never appear in the stream). */
  def seed(schema: String, name: String, rows: Seq[Seq[Option[String]]]): Unit =
    synchronized {
      val t = table(schema, name)
      rows.foreach { r =>
        require(r.size == t.cols.size,
          s"row width ${r.size} != ${t.cols.size} for $schema.$name")
        t.rows += r.toIndexedSeq
      }
    }

  def confirmedLsn(slot: String): Long =
    slots.getOrElse(slot, throw new IllegalArgumentException(
      s"""replication slot "$slot" does not exist""")).confirmed
  def slotExists(slot: String): Boolean = slots.contains(slot)
  def publicationTables(pub: String): Set[(String, String)] =
    publications.get(pub).map(_.toSet).getOrElse(Set.empty)
  def maxWalLsn: Long = wal.lastOption.map(_.lsn).getOrElse(0L)

  // ----------------------------------------------------------- commit

  /** Commit one transaction: apply every change to the stored rows AND
    * append the pgoutput frames a real server would stream — Begin, one
    * Relation message per touched relation, the DML frames, Commit. The
    * DML frames are built with the repo's own encoder, so what the spec
    * plants is exactly what the decoder must reconstruct. */
  def commit(xid: Long, changes: Seq[Change]): Unit = synchronized {
    require(changes.nonEmpty, "empty transaction")
    def append(data: Array[Byte], rel: Option[Long]): Unit = {
      wal += WalEntry(nextLsn, xid, data, rel); nextLsn += 1
    }
    append(PgOutputEncoder.skipped('B'), None)
    changes.map(c => (c.schema, c.table)).distinct.foreach { case (s, t) =>
      append(PgOutputEncoder.skipped('R'), Some(table(s, t).oid))
    }
    changes.foreach { ch =>
      val t = table(ch.schema, ch.table)
      ch match {
        case Insert(_, _, values) =>
          require(values.size == t.cols.size,
            s"insert width ${values.size} != ${t.cols.size}")
          append(PgOutputEncoder.insert(t.oid,
            values.map(v => v.fold(PgValue.Null: PgValue)(PgValue.Text))),
            Some(t.oid))
          t.rows += values.toIndexedSeq
        case Update(_, _, values, toastCols) =>
          require(values.size == t.cols.size,
            s"update width ${values.size} != ${t.cols.size}")
          val pkIdx = t.cols.zipWithIndex.filter(_._1.pk).map(_._2)
          require(pkIdx.nonEmpty, s"update on pk-less table ${t.name}")
          val at = t.rows.indexWhere(r => pkIdx.forall(i => r(i) == values(i)))
          require(at >= 0, s"update misses row in ${t.name}")
          val old = t.rows(at)
          val payload = t.cols.zipWithIndex.map { case (c, i) =>
            if (toastCols.contains(c.name)) PgValue.Unchanged
            else values(i).fold(PgValue.Null: PgValue)(PgValue.Text)
          }
          val oldTuple =
            if (toastCols.isEmpty) None
            else Some(old.map(v => v.fold(PgValue.Null: PgValue)(PgValue.Text)).toSeq)
          append(PgOutputEncoder.update(t.oid, payload, oldTuple, oldKind = 'O'),
            Some(t.oid))
          t.rows(at) = t.cols.zipWithIndex.map { case (c, i) =>
            if (toastCols.contains(c.name)) old(i) else values(i)
          }
        case Delete(_, _, pkValues) =>
          val key = t.cols.map { c =>
            pkValues.get(c.name) match {
              case Some(v) =>
                require(c.pk, s"delete key ${c.name} is not a PK column")
                PgValue.Text(v): PgValue
              case None => PgValue.Null: PgValue
            }
          }
          val pkIdx = t.cols.zipWithIndex.filter(_._1.pk).map(_._2)
          val at = t.rows.indexWhere(r =>
            pkIdx.forall(i => r(i).contains(pkValues(t.cols(i).name))))
          require(at >= 0, s"delete misses row in ${t.name}")
          append(PgOutputEncoder.delete(t.oid, key, kind = 'K'), Some(t.oid))
          t.rows.remove(at)
        case Truncate(_, _) =>
          append(PgOutputEncoder.truncate(Seq(t.oid)), Some(t.oid))
          t.rows.clear()
      }
    }
    append(PgOutputEncoder.skipped('C'), None)
  }

  // ----------------------------------------------------- entry points

  /** Row-returning statement → (column names, rows). */
  def query(sql: String): (Seq[String], Seq[IndexedSeq[Any]]) = synchronized {
    statements += sql
    val p = new Parser(lex(sql), sql)
    val out = p.statement() match {
      case Some(sel) => evalSelect(sel, None)
      case None => (Seq.empty, Seq.empty)
    }
    p.expectEnd()
    out
  }

  /** Execute a statement, discarding rows (the JdbcClient `execute`
    * verb — slot advance and publication DDL arrive here). */
  def execute(sql: String): Unit = { query(sql); () }

  /** The COPY snapshot: parse `COPY (SELECT "c", … FROM s.t) TO STDOUT`,
    * serialize the stored rows in PG text format and return them as
    * chunks cut at ARBITRARY byte positions (escapes and UTF-8 sequences
    * split mid-way — the exact adversarial shape CopyText's chunk state
    * exists for). */
  def copyChunks(sql: String, chunkSize: Int): Iterator[Array[Byte]] = synchronized {
    require(chunkSize > 0, "chunkSize must be positive")
    statements += sql
    val p = new Parser(lex(sql), sql)
    val (t, colNames) = p.copyStatement()
    p.expectEnd()
    val idx = colNames.map(t.colIndex)
    val bytes = new java.io.ByteArrayOutputStream()
    t.rows.foreach { r =>
      val line = idx.map(i => copyField(r(i))).mkString("\t") + "\n"
      bytes.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    bytes.toByteArray.grouped(chunkSize)
  }

  /** PG COPY text-format field encoding: `\N` for NULL; backslash and
    * control bytes C-escaped; the tab delimiter and newline terminator
    * never appear unescaped inside a field. */
  private def copyField(v: Option[String]): String = v match {
    case None => "\\N"
    case Some(s) =>
      val sb = new StringBuilder
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case 0x0B => sb.append("\\v")
        case c => sb.append(c)
      }
      sb.toString
  }

  // ----------------------------------------------------------- parser
  private final class Parser(toks: Vector[Tok], sql: String) {
    private var pos = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg at token $pos in: ${sql.take(200)}")
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok =
      { val t = toks.lift(pos).getOrElse(err("unexpected end")); pos += 1; t }
    private def kw(word: String): Unit = next() match {
      case Ident(s, false) if s.equalsIgnoreCase(word) => ()
      case other => err(s"expected $word, got $other")
    }
    private def isKw(word: String): Boolean = peek match {
      case Some(Ident(s, false)) => s.equalsIgnoreCase(word)
      case _ => false
    }
    private def op(o: String): Unit = next() match {
      case Op(`o`) => ()
      case other => err(s"expected '$o', got $other")
    }
    private def isOp(o: String): Boolean = peek.contains(Op(o))
    private def ident(): String = next() match {
      case Ident(s, _) => s
      case other => err(s"expected identifier, got $other")
    }
    def expectEnd(): Unit = {
      while (isOp(";")) pos += 1
      if (pos != toks.length) err(s"trailing tokens: ${toks.drop(pos).take(5)}")
    }

    private val Reserved = Set(
      "from", "where", "order", "left", "join", "on", "as", "and", "in",
      "group", "by", "for", "add", "to")

    /** Returns the SELECT when the statement yields rows, None for DDL. */
    def statement(): Option[Sel] = peek match {
      case Some(Ident(s, false)) if s.equalsIgnoreCase("SELECT") =>
        Some(select())
      case Some(Ident(s, false)) if s.equalsIgnoreCase("CREATE") =>
        createPublication(); None
      case Some(Ident(s, false)) if s.equalsIgnoreCase("ALTER") =>
        alterPublication(); None
      case other => err(s"unsupported statement start: $other")
    }

    def select(): Sel = {
      kw("SELECT")
      val items = ArrayBuffer(item())
      while (isOp(",")) { op(","); items += item() }
      var from: Option[Either[FromTable, Fn]] = None
      val joins = ArrayBuffer.empty[JoinSpec]
      if (isKw("FROM")) {
        kw("FROM")
        from = Some(fromItem())
        var more = true
        while (more) {
          if (isKw("LEFT")) {
            kw("LEFT"); kw("JOIN")
            val t = fromTable()
            kw("ON")
            joins += JoinSpec(leftOuter = true, t, expr())
          } else if (isKw("JOIN")) {
            kw("JOIN")
            val t = fromTable()
            kw("ON")
            joins += JoinSpec(leftOuter = false, t, expr())
          } else more = false
        }
      }
      val where = if (isKw("WHERE")) { kw("WHERE"); Some(expr()) } else None
      val orderBy = if (isKw("ORDER")) {
        kw("ORDER"); kw("BY")
        Some(colRef())
      } else None
      Sel(items.toSeq, from, joins.toSeq, where, orderBy)
    }

    private def item(): Item = {
      val e = expr()
      // aliases only via AS — the emitted SQL never relies on bare
      // aliasing, and accepting it would mask dropped commas
      val alias = if (isKw("AS")) { kw("AS"); Some(ident()) } else None
      Item(e, alias)
    }

    private def fromItem(): Either[FromTable, Fn] = {
      val first = ident()
      if (isOp("(")) Right(fnArgs(first))
      else {
        pos -= 1
        Left(fromTable())
      }
    }

    private def fromTable(): FromTable = {
      val first = ident()
      val (qual, name) =
        if (isOp(".")) { op("."); (Some(first), ident()) }
        else (None, first)
      val alias = peek match {
        case Some(Ident(a, false)) if !Reserved.contains(a.toLowerCase) =>
          pos += 1; Some(a)
        case _ => None
      }
      FromTable(qual, name, alias)
    }

    private def fnArgs(name: String): Fn = {
      op("(")
      val args = ArrayBuffer.empty[Expr]
      if (!isOp(")")) {
        args += expr()
        while (isOp(",")) { op(","); args += expr() }
      }
      op(")")
      Fn(name.toLowerCase, args.toSeq)
    }

    private def colRef(): ColRef = {
      val first = ident()
      if (isOp(".")) { op("."); ColRef(Some(first), ident()) }
      else ColRef(None, first)
    }

    // expr := cmp (AND cmp)*
    private def expr(): Expr = {
      val terms = ArrayBuffer(cmp())
      while (isKw("AND")) { kw("AND"); terms += cmp() }
      if (terms.size == 1) terms.head else AndE(terms.toSeq)
    }

    private def cmp(): Expr = {
      val l = postfix()
      if (isOp("=")) { op("="); EqE(l, postfix()) }
      else if (isKw("IN")) {
        kw("IN"); op("(")
        val vals = ArrayBuffer(postfix())
        while (isOp(",")) { op(","); vals += postfix() }
        op(")")
        InE(l, vals.toSeq)
      } else l
    }

    private def postfix(): Expr = {
      var e = primary()
      while (isOp("::")) { op("::"); e = CastE(e, ident().toLowerCase) }
      e
    }

    private def primary(): Expr = next() match {
      case Str(s) => Lit(s)
      case Num(s) =>
        Lit(if (s.contains('.')) s.toDouble else s.toLong)
      case Ident(s, false) if s.equalsIgnoreCase("NULL") => Lit(null)
      case Ident(s, false) if s.equalsIgnoreCase("EXISTS") =>
        op("(")
        val sub = select()
        op(")")
        ExistsE(sub)
      case Ident(s, _) =>
        if (isOp("(")) fnArgs(s)
        else if (isOp(".")) { op("."); ColRef(Some(s), ident()) }
        else ColRef(None, s)
      case Op("(") =>
        val e = expr()
        op(")")
        e
      case other => err(s"unexpected token $other in expression")
    }

    // CREATE PUBLICATION name FOR TABLE s.t [, s.t]*
    private def createPublication(): Unit = {
      kw("CREATE"); kw("PUBLICATION")
      val name = ident()
      if (publications.contains(name))
        err(s"""publication "$name" already exists""")
      kw("FOR"); kw("TABLE")
      val ts = LinkedHashSet(qualifiedTable())
      while (isOp(",")) { op(","); ts += qualifiedTable() }
      publications(name) = ts
    }

    // ALTER PUBLICATION name ADD TABLE s.t [, s.t]*
    private def alterPublication(): Unit = {
      kw("ALTER"); kw("PUBLICATION")
      val name = ident()
      val pub = publications.getOrElse(name,
        err(s"""publication "$name" does not exist"""))
      kw("ADD"); kw("TABLE")
      var more = true
      while (more) {
        val t = qualifiedTable()
        if (pub.contains(t))
          err(s"""relation "${t._1}.${t._2}" is already member of publication "$name"""")
        pub += t
        if (isOp(",")) op(",") else more = false
      }
    }

    private def qualifiedTable(): (String, String) = {
      val s = ident(); op("."); val t = ident()
      table(s, t) // must exist — CREATE/ALTER PUBLICATION verifies relations
      (s, t)
    }

    // COPY ( SELECT "c" [, "c"]* FROM s.t ) TO STDOUT
    def copyStatement(): (Table, Seq[String]) = {
      kw("COPY"); op("("); kw("SELECT")
      val cols = ArrayBuffer(ident())
      while (isOp(",")) { op(","); cols += ident() }
      kw("FROM")
      val (s, t) = { val a = ident(); op("."); (a, ident()) }
      op(")"); kw("TO"); kw("STDOUT")
      (table(s, t), cols.toSeq)
    }
  }

  // -------------------------------------------------------- evaluation

  /** Column sets of the virtual catalog tables — the LEFT JOIN null row
    * must carry the table's columns even when the table is EMPTY (a
    * comment-free database has zero pg_description rows, and deriving
    * the null row from a first row that does not exist made
    * `pgd.description` resolve to an error instead of NULL). */
  private def catalogColumns(qual: Option[String], name: String): Seq[String] =
    (qual.map(_.toLowerCase), name.toLowerCase) match {
      case (Some("information_schema"), "columns") => Seq(
        "table_schema", "table_name", "column_name", "udt_name",
        "is_nullable", "ordinal_position")
      case (Some("information_schema"), "table_constraints") => Seq(
        "constraint_name", "table_schema", "table_name", "constraint_type")
      case (Some("information_schema"), "key_column_usage") => Seq(
        "constraint_name", "table_schema", "column_name")
      case (Some("pg_catalog"), "pg_statio_all_tables") => Seq(
        "schemaname", "relname", "relid")
      case (Some("pg_catalog"), "pg_description") => Seq(
        "objoid", "objsubid", "description")
      case (None, "pg_class") => Seq("oid", "relname", "relnamespace", "reltuples")
      case (None, "pg_namespace") => Seq("oid", "nspname")
      case (None, "pg_publication") => Seq("pubname")
      case (None, "pg_publication_tables") => Seq("pubname", "schemaname", "tablename")
      case (None, "pg_replication_slots") => Seq("slot_name", "plugin", "wal_status")
      case _ => throw new IllegalArgumentException(
        s"""relation "${qual.fold("")(_ + ".")}$name" does not exist""")
    }

  /** Catalog virtual tables, materialized per query — tiny by design. */
  private def catalogRows(qual: Option[String], name: String): Seq[Map[String, Any]] = {
    val key = (qual.map(_.toLowerCase), name.toLowerCase)
    val all = tables.values.toSeq
    key match {
      case (Some("information_schema"), "columns") =>
        for (t <- all; (c, i) <- t.cols.zipWithIndex) yield Map[String, Any](
          "table_schema" -> t.schema, "table_name" -> t.name,
          "column_name" -> c.name, "udt_name" -> c.udt,
          "is_nullable" -> (if (c.nullable) "YES" else "NO"),
          "ordinal_position" -> (i + 1L))
      case (Some("information_schema"), "table_constraints") =>
        all.filter(_.cols.exists(_.pk)).map(t => Map[String, Any](
          "constraint_name" -> s"${t.name}_pkey", "table_schema" -> t.schema,
          "table_name" -> t.name, "constraint_type" -> "PRIMARY KEY"))
      case (Some("information_schema"), "key_column_usage") =>
        for (t <- all; c <- t.cols if c.pk) yield Map[String, Any](
          "constraint_name" -> s"${t.name}_pkey", "table_schema" -> t.schema,
          "column_name" -> c.name)
      case (Some("pg_catalog"), "pg_statio_all_tables") =>
        all.map(t => Map[String, Any](
          "schemaname" -> t.schema, "relname" -> t.name, "relid" -> t.oid))
      case (Some("pg_catalog"), "pg_description") =>
        all.flatMap { t =>
          t.comment.map(c => Map[String, Any](
            "objoid" -> t.oid, "objsubid" -> 0L, "description" -> c)).toSeq ++
            t.cols.zipWithIndex.collect {
              case (c, i) if c.comment.nonEmpty => Map[String, Any](
                "objoid" -> t.oid, "objsubid" -> (i + 1L),
                "description" -> c.comment)
            }
        }
      case (None, "pg_class") =>
        all.map(t => Map[String, Any](
          "oid" -> t.oid, "relname" -> t.name,
          "relnamespace" -> nsOids(t.schema),
          "reltuples" ->
            (if (t.reltuples >= 0) t.reltuples else t.rows.size.toDouble)))
      case (None, "pg_namespace") =>
        nsOids.toSeq.map { case (s, o) =>
          Map[String, Any]("oid" -> o, "nspname" -> s)
        }
      case (None, "pg_publication") =>
        publications.keys.toSeq.map(p => Map[String, Any]("pubname" -> p))
      case (None, "pg_publication_tables") =>
        publications.toSeq.flatMap { case (p, ts) =>
          ts.toSeq.map { case (s, t) => Map[String, Any](
            "pubname" -> p, "schemaname" -> s, "tablename" -> t)
          }
        }
      case (None, "pg_replication_slots") =>
        slots.toSeq.map { case (n, s) => Map[String, Any](
          "slot_name" -> n, "plugin" -> s.plugin, "wal_status" -> "reserved")
        }
      case _ =>
        throw new IllegalArgumentException(
          s"""relation "${qual.fold("")(_ + ".")}$name" does not exist""")
    }
  }

  private case class Env(
      bindings: List[(String, Map[String, Any])], outer: Option[Env]) {
    def resolve(qual: Option[String], name: String): Any = qual match {
      case Some(q) => bindings.find(_._1 == q) match {
        case Some((_, row)) => row.getOrElse(name,
          throw new IllegalArgumentException(
            s"""column $q.$name does not exist"""))
        case None => outer.map(_.resolve(qual, name)).getOrElse(
          throw new IllegalArgumentException(
            s"""missing FROM-clause entry for table "$q""""))
      }
      case None =>
        bindings.filter(_._2.contains(name)) match {
          case (_, row) :: Nil => row(name)
          case Nil => outer.map(_.resolve(qual, name)).getOrElse(
            throw new IllegalArgumentException(
              s"""column "$name" does not exist"""))
          case _ => throw new IllegalArgumentException(
            s"""column reference "$name" is ambiguous""")
        }
    }
  }

  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, _) | (_, null) => false // SQL three-valued: NULL = x is not true
    case (x: Long, y: Double) => x.toDouble == y
    case (x: Double, y: Long) => x == y.toDouble
    case (x, y) => x == y
  }

  private def evalBool(e: Expr, env: Env): Boolean = eval(e, env) match {
    case b: Boolean => b
    case null => false
    case other => throw new IllegalArgumentException(
      s"argument of WHERE/ON must be boolean, got $other")
  }

  private def eval(e: Expr, env: Env): Any = e match {
    case Lit(v) => v
    case ColRef(q, n) => env.resolve(q, n)
    case EqE(l, r) => valueEq(eval(l, env), eval(r, env))
    case AndE(terms) => terms.forall(t => evalBool(t, env))
    case InE(x, vals) =>
      val v = eval(x, env)
      vals.exists(t => valueEq(v, eval(t, env)))
    case ExistsE(sub) => evalSelect(sub, Some(env))._2.nonEmpty
    case CastE(inner, to) => evalCast(eval(inner, env), to)
    case Fn(name, args) => evalFn(name, args.map(eval(_, env)))
  }

  private def evalCast(v: Any, to: String): Any = to match {
    case "regclass" =>
      val text = v match {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"cannot cast $other to regclass")
      }
      // '"schema"."table"' (the emitted shape) or bare schema.table
      val parts = text.split('.').map(_.stripPrefix("\"").stripSuffix("\""))
      if (parts.length != 2) throw new IllegalArgumentException(
        s"""invalid relation name "$text"""")
      table(parts(0), parts(1)).oid
    case "bigint" => v match {
      case l: Long => l
      case d: Double => d.toLong
      case s: String => s.toLong
      case other => throw new IllegalArgumentException(
        s"cannot cast $other to bigint")
    }
    case other =>
      throw new IllegalArgumentException(s"unsupported cast ::$other")
  }

  private def evalFn(name: String, args: Seq[Any]): Any = name match {
    case "coalesce" => args.find(_ != null).orNull
    case "obj_description" =>
      args match {
        case Seq(oid: Long) =>
          tables.values.find(_.oid == oid).flatMap(_.comment).orNull
        case other => throw new IllegalArgumentException(
          s"obj_description expects an oid, got $other")
      }
    case "pg_create_logical_replication_slot" =>
      args match {
        case Seq(slot: String, plugin: String) =>
          if (slots.contains(slot)) throw new IllegalArgumentException(
            s"""replication slot "$slot" already exists""")
          if (plugin != "pgoutput") throw new IllegalArgumentException(
            s"""output plugin "$plugin" is not supported""")
          slots(slot) = new Slot(plugin)
          s"($slot,${PgLsn.fromLong(maxWalLsn)})"
        case other => throw new IllegalArgumentException(
          s"pg_create_logical_replication_slot(name, plugin) got $other")
      }
    case "pg_replication_slot_advance" =>
      args match {
        case Seq(slot: String, lsnText: String) =>
          val s = slots.getOrElse(slot, throw new IllegalArgumentException(
            s"""replication slot "$slot" does not exist"""))
          if (!lsnText.matches("[0-9A-Fa-f]+/[0-9A-Fa-f]+"))
            throw new IllegalArgumentException(
              s"""invalid input syntax for type pg_lsn: "$lsnText"""")
          val to = PgLsn.toLong(lsnText)
          if (to < s.confirmed) throw new IllegalArgumentException(
            s"cannot advance replication slot to $lsnText, " +
              s"minimum is ${PgLsn.fromLong(s.confirmed)}")
          if (to > maxWalLsn) throw new IllegalArgumentException(
            s"cannot advance replication slot beyond the WAL end " +
              s"(${PgLsn.fromLong(maxWalLsn)})")
          s.confirmed = to
          s"($slot,$lsnText)"
        case other => throw new IllegalArgumentException(
          s"pg_replication_slot_advance(slot, lsn) got $other")
      }
    case other =>
      throw new IllegalArgumentException(s"function $other(…) does not exist")
  }

  /** The peek SRF: strict option checking, then the slot's pending
    * frames — publication-filtered, confirmed-LSN-bounded, limited.
    * Non-consuming: nothing moves until
    * `pg_replication_slot_advance` (the at-least-once contract). */
  private def peekRows(args: Seq[Expr]): Seq[Map[String, Any]] = {
    val env = Env(Nil, None)
    args match {
      case Seq(slotE, uptoE, limitE, optRest @ _*) =>
        val slotName = eval(slotE, env) match {
          case s: String => s
          case other => throw new IllegalArgumentException(
            s"slot name must be text, got $other")
        }
        eval(uptoE, env) match {
          case null => ()
          case other => throw new IllegalArgumentException(
            s"upto_lsn must be NULL in the peek protocol, got $other")
        }
        val limit = eval(limitE, env) match {
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"upto_nchanges must be an integer, got $other")
        }
        val opts = optRest.map(eval(_, env)).map {
          case s: String => s
          case other => throw new IllegalArgumentException(
            s"plugin options must be text, got $other")
        }
        if (opts.size % 2 != 0) throw new IllegalArgumentException(
          "plugin options must be name/value pairs")
        val optMap = opts.grouped(2).map(p => p(0) -> p(1)).toMap
        optMap.keys.foreach { k =>
          if (k != "proto_version" && k != "publication_names")
            throw new IllegalArgumentException(s"""unknown plugin option "$k"""")
        }
        if (!optMap.get("proto_version").contains("1"))
          throw new IllegalArgumentException(
            s"unsupported proto_version ${optMap.get("proto_version")}")
        val pubNames = optMap.getOrElse("publication_names",
          throw new IllegalArgumentException("publication_names is required"))
          .split(',').map(_.trim).toSeq
        val pubTables = pubNames.flatMap { p =>
          publications.getOrElse(p, throw new IllegalArgumentException(
            s"""publication "$p" does not exist""")).toSeq
        }.toSet
        val pubOids = pubTables.map { case (s, t) => table(s, t).oid }
        val slot = slots.getOrElse(slotName, throw new IllegalArgumentException(
          s"""replication slot "$slotName" does not exist"""))
        peeksServed += 1
        wal.filter(e => e.lsn > slot.confirmed &&
            e.rel.forall(pubOids.contains))
          .take(math.min(limit, Int.MaxValue).toInt)
          .map(e => Map[String, Any](
            "lsn" -> PgLsn.fromLong(e.lsn), "xid" -> e.xid, "data" -> e.data))
          .toSeq
      case other => throw new IllegalArgumentException(
        s"pg_logical_slot_peek_binary_changes expects (slot, upto_lsn, " +
          s"upto_nchanges, options…), got ${other.size} arguments")
    }
  }

  private def evalSelect(
      sel: Sel, outer: Option[Env]): (Seq[String], Seq[IndexedSeq[Any]]) = {
    // FROM → candidate binding lists
    val base: Seq[List[(String, Map[String, Any])]] = sel.from match {
      case None => Seq(Nil)
      case Some(Left(ft)) =>
        val rows = catalogRows(ft.qual, ft.name)
        rows.map(r => List(ft.alias.getOrElse(ft.name) -> r))
      case Some(Right(Fn(name, args))) =>
        if (name != "pg_logical_slot_peek_binary_changes")
          throw new IllegalArgumentException(
            s"function $name(…) is not a known set-returning function")
        peekRows(args).map(r => List(name -> r))
    }
    val joined = sel.joins.foldLeft(base) { (acc, j) =>
      val alias = j.t.alias.getOrElse(j.t.name)
      val rows = catalogRows(j.t.qual, j.t.name)
      // from the SCHEMA, not a first row: an empty catalog table must
      // still null-extend with its full column set
      lazy val nullRow: Map[String, Any] =
        catalogColumns(j.t.qual, j.t.name).map(_ -> (null: Any)).toMap
      acc.flatMap { bindings =>
        val matches = rows.filter { r =>
          evalBool(j.on, Env(bindings :+ (alias -> r), outer))
        }
        if (matches.isEmpty && j.leftOuter)
          Seq(bindings :+ (alias -> nullRow))
        else matches.map(r => bindings :+ (alias -> r))
      }
    }
    val filtered = sel.where match {
      case None => joined
      case Some(w) => joined.filter(b => evalBool(w, Env(b, outer)))
    }
    val ordered = sel.orderBy match {
      case None => filtered
      case Some(ob) => filtered.sortWith { (a, b) =>
        anyLt(eval(ob, Env(a, outer)), eval(ob, Env(b, outer)))
      }
    }
    val names = sel.items.map { it =>
      it.alias.getOrElse(it.e match {
        case ColRef(_, n) => n
        case CastE(ColRef(_, n), _) => n
        case Fn(n, _) => n
        case _ => "?column?"
      })
    }
    val rows = ordered.map { b =>
      sel.items.map(it => eval(it.e, Env(b, outer))).toIndexedSeq
    }
    (names, rows)
  }

  private def anyLt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Double, y: Double) => x < y
    case (x: Long, y: Double) => x < y
    case (x: Double, y: Long) => x < y
    case (x: String, y: String) => x < y
    case _ => false
  }
}
