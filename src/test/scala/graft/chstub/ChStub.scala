package graft.chstub

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal EXECUTABLE ClickHouse endpoint for tests — the same trick the
  * Mongo side uses ([[graft.mongostub.StubDriver]]): the dialect's
  * statement text is parsed and applied against an in-memory engine, so
  * the CH-specific SQL the sink emits (CREATE … ENGINE =
  * ReplacingMergeTree() ORDER BY … SETTINGS …, batched multi-row INSERT,
  * `ALTER TABLE … DELETE`, `ALTER TABLE … ADD COLUMN`, TRUNCATE, the
  * `select exists(…)` probe) is EXECUTED, not just golden-compared.
  *
  * The grammar is a strict subset of ClickHouse's
  * (https://clickhouse.com/docs/en/sql-reference — public docs): strict
  * on purpose, so a malformed emission (bad escaping, a stray `??` from
  * the K7 quirk, an unquoted string) FAILS the statement the way the
  * real endpoint would, instead of slipping through a lenient regex.
  *
  * ReplacingMergeTree read semantics are modeled as the engine documents
  * them for the sink's usage: FINAL-style collapse keeps the LAST
  * INSERTED row per ORDER BY key (the version-less engine keeps the last
  * row of the merged selection; the sink relies on insert order — see
  * `SqlDialect.upsertRequiresDeleteFirst`).
  */
object ChStubEngine {

  // ----------------------------------------------------------- tokenizer
  sealed trait Tok
  case class Ident(s: String, quoted: Boolean = false) extends Tok
  case class Str(s: String) extends Tok
  case class Num(s: String) extends Tok
  case class Punct(c: Char) extends Tok

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def err(msg: String) =
      throw new IllegalArgumentException(s"syntax error at char $i: $msg")
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { // CH string literal: '' and backslash escapes
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed) {
          if (i >= n) err("unterminated string literal")
          sql.charAt(i) match {
            case '\'' if i + 1 < n && sql.charAt(i + 1) == '\'' =>
              sb.append('\''); i += 2
            case '\'' => closed = true; i += 1
            case '\\' =>
              if (i + 1 >= n) err("dangling backslash in string")
              sql.charAt(i + 1) match {
                case '\\' => sb.append('\\')
                case 'n' => sb.append('\n')
                case 'r' => sb.append('\r')
                case '0' => sb.append('\u0000')
                case 't' => sb.append('\t')
                case other => err(s"unsupported escape \\$other")
              }
              i += 2
            case ch => sb.append(ch); i += 1
          }
        }
        out += Str(sb.toString)
      } else if (c == '`') {
        val end = sql.indexOf('`', i + 1)
        if (end < 0) err("unterminated backquoted identifier")
        out += Ident(sql.substring(i + 1, end), quoted = true)
        i = end + 1
      } else if (c.isDigit || ((c == '-' || c == '+') && i + 1 < n &&
          (sql.charAt(i + 1).isDigit || sql.charAt(i + 1) == '.'))) {
        val start = i
        i += 1
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' ||
          sql.charAt(i) == 'e' || sql.charAt(i) == 'E' ||
          ((sql.charAt(i) == '-' || sql.charAt(i) == '+') &&
            (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += Num(sql.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += Ident(sql.substring(start, i))
      } else if ("(),;=[].".indexOf(c) >= 0) {
        out += Punct(c); i += 1
      } else err(s"unexpected character '$c'")
    }
    out.result()
  }

  // ------------------------------------------------------------- types
  /** Parsed column type, reduced to the families the value checker
    * needs; `text` preserves the exact declared rendering. */
  case class ColType(
      base: String, nullable: Boolean, inner: Option[ColType], text: String)

  private val ScalarBases = Set(
    "Int8", "Int16", "Int32", "Int64", "Int128", "Int256",
    "UInt8", "UInt16", "UInt32", "UInt64", "UInt128", "UInt256",
    "Float32", "Float64", "Bool", "String", "UUID", "Date", "Date32",
    "Time", "Decimal", "Unknown")

  // ------------------------------------------------------------- values
  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  // ------------------------------------------------------------ storage
  final class Column(val name: String, var tpe: ColType, var comment: String)

  final class Table(val database: String, val name: String) {
    val columns = new ArrayBuffer[Column]
    var engine: String = ""
    var orderBy: Seq[String] = Nil
    val settings = new LinkedHashMap[String, String]
    var comment: String = ""
    /** (insertSeq, values-by-column-name) — seq orders the Replacing
      * collapse. */
    val rows = new ArrayBuffer[(Long, Map[String, Any])]
    var nextSeq: Long = 0L

    def column(n: String): Column = columns.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"unknown column '$n' in $database.$name"))

    /** FINAL-style read: last inserted row per ORDER BY key (all rows
      * when the table has no ORDER BY — nothing collapses). */
    def finalRows: Seq[Map[String, Any]] =
      if (orderBy.isEmpty) rows.toSeq.map(_._2)
      else rows.groupBy(r => orderBy.map(r._2(_)))
        .values.map(_.maxBy(_._1)._2).toSeq
  }
}

final class ChStubEngine {
  import ChStubEngine._

  private val tables = new LinkedHashMap[(String, String), Table]
  val executed = new ArrayBuffer[String]

  def table(database: String, name: String): Table =
    tables.getOrElse((database, name), throw new IllegalArgumentException(
      s"table $database.$name does not exist"))
  def tableExists(database: String, name: String): Boolean =
    tables.contains((database, name))

  /** Execute one statement; throws IllegalArgumentException on any
    * syntax or semantic violation (the HTTP wrapper maps that to 400,
    * like the real endpoint's DB::Exception). */
  def execute(sql: String): Unit = synchronized {
    executed += sql
    val p = new Parser(lex(sql), sql)
    p.statement()
    p.expectEnd()
  }

  /** Scalar query endpoint: exactly the K6 probe shape
    * `select exists(select 1 from db.t)`. Returns "1" or "0". */
  def query(sql: String): String = synchronized {
    val p = new Parser(lex(sql), sql)
    val r = p.existsProbe()
    p.expectEnd()
    r
  }

  // ------------------------------------------------------------- parser
  private final class Parser(toks: Vector[Tok], sql: String) {
    private var pos = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg at token $pos in: ${sql.take(200)}")
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = { val t = toks.lift(pos).getOrElse(err("unexpected end")); pos += 1; t }
    private def kw(word: String): Unit = next() match {
      case Ident(s, false) if s.equalsIgnoreCase(word) => ()
      case other => err(s"expected $word, got $other")
    }
    private def isKw(word: String): Boolean = peek match {
      case Some(Ident(s, false)) => s.equalsIgnoreCase(word)
      case _ => false
    }
    private def punct(c: Char): Unit = next() match {
      case Punct(`c`) => ()
      case other => err(s"expected '$c', got $other")
    }
    private def ident(): String = next() match {
      case Ident(s, _) => s
      case other => err(s"expected identifier, got $other")
    }
    private def str(): String = next() match {
      case Str(s) => s
      case other => err(s"expected string literal, got $other")
    }
    private def num(): String = next() match {
      case Num(s) => s
      case other => err(s"expected number, got $other")
    }
    def expectEnd(): Unit = {
      while (peek.contains(Punct(';'))) pos += 1
      if (pos != toks.length) err(s"trailing tokens: ${toks.drop(pos).take(5)}")
    }

    private def qualifiedName(): (String, String) = {
      val db = ident(); punct('.'); (db, ident())
    }

    def statement(): Unit = peek match {
      case Some(Ident(s, false)) if s.equalsIgnoreCase("CREATE") => createTable()
      case Some(Ident(s, false)) if s.equalsIgnoreCase("INSERT") => insert()
      case Some(Ident(s, false)) if s.equalsIgnoreCase("ALTER") => alter()
      case Some(Ident(s, false)) if s.equalsIgnoreCase("TRUNCATE") => truncate()
      case other => err(s"unsupported statement start: $other")
    }

    // CREATE TABLE db.t(`c` Type COMMENT 's', …) ENGINE = ReplacingMergeTree()
    // [ORDER BY (c, …)] SETTINGS k = v [, k = v]* [COMMENT 's'] [;]
    private def createTable(): Unit = {
      kw("CREATE"); kw("TABLE")
      val (db, name) = qualifiedName()
      if (tableExists(db, name))
        err(s"table $db.$name already exists")
      val t = new Table(db, name)
      punct('(')
      var done = false
      while (!done) {
        val cName = next() match {
          case Ident(s, _) => s
          case other => err(s"expected column name, got $other")
        }
        val tpe = colType()
        var comment = ""
        if (isKw("COMMENT")) { kw("COMMENT"); comment = str() }
        t.columns += new Column(cName, tpe, comment)
        next() match {
          case Punct(',') => ()
          case Punct(')') => done = true
          case other => err(s"expected ',' or ')' in column list, got $other")
        }
      }
      kw("ENGINE"); punct('=')
      val eng = ident()
      if (eng != "ReplacingMergeTree" && eng != "MergeTree")
        err(s"unsupported engine $eng")
      punct('('); punct(')')
      t.engine = eng
      if (isKw("ORDER")) {
        kw("ORDER"); kw("BY"); punct('(')
        val cols = ArrayBuffer(ident())
        while (peek.contains(Punct(','))) { punct(','); cols += ident() }
        punct(')')
        cols.foreach(t.column) // must reference declared columns
        t.orderBy = cols.toSeq
      }
      kw("SETTINGS")
      var more = true
      while (more) {
        val k = ident(); punct('=')
        val v = next() match {
          case Num(s) => s
          case Str(s) => s
          case other => err(s"expected setting value, got $other")
        }
        if (!Set("index_granularity", "min_age_to_force_merge_seconds",
          "storage_policy").contains(k)) err(s"unknown setting $k")
        t.settings(k) = v
        if (peek.contains(Punct(','))) punct(',') else more = false
      }
      if (isKw("COMMENT")) { kw("COMMENT"); t.comment = str() }
      tables((db, name)) = t
    }

    private def colType(): ColType = {
      val base = ident()
      base match {
        case "Nullable" =>
          punct('('); val inner = colType(); punct(')')
          if (inner.nullable) err("Nullable(Nullable(…)) is invalid")
          ColType(inner.base, nullable = true, inner.inner,
            s"Nullable(${inner.text})")
        case "Array" =>
          punct('('); val inner = colType(); punct(')')
          ColType("Array", nullable = false, Some(inner), s"Array(${inner.text})")
        case "FixedString" =>
          punct('('); val sz = num(); punct(')')
          ColType("String", nullable = false, None, s"FixedString($sz)")
        case "DateTime" =>
          val text = if (peek.contains(Punct('('))) {
            punct('('); val tz = str(); punct(')'); s"DateTime('$tz')"
          } else "DateTime"
          ColType("DateTime", nullable = false, None, text)
        case "DateTime64" =>
          punct('('); val prec = num()
          val text = if (peek.contains(Punct(','))) {
            punct(','); val tz = str(); s"DateTime64($prec, '$tz')"
          } else s"DateTime64($prec)"
          punct(')')
          ColType("DateTime", nullable = false, None, text)
        case "Time64" =>
          punct('('); val prec = num(); punct(')')
          ColType("Time", nullable = false, None, s"Time64($prec)")
        case b if ScalarBases.contains(b) =>
          ColType(b, nullable = false, None, b)
        case other => err(s"unknown type $other")
      }
    }

    // INSERT INTO db.t (c1, c2) VALUES(v,…), (v,…)
    private def insert(): Unit = {
      kw("INSERT"); kw("INTO")
      val (db, name) = qualifiedName()
      val t = table(db, name)
      punct('(')
      val cols = ArrayBuffer(ident())
      while (peek.contains(Punct(','))) { punct(','); cols += ident() }
      punct(')')
      val colTypes = cols.map(c => t.column(c).tpe)
      kw("VALUES")
      var more = true
      val staged = ArrayBuffer.empty[Map[String, Any]]
      while (more) {
        punct('(')
        val vals = ArrayBuffer.empty[Any]
        var vMore = true
        while (vMore) {
          vals += value(colTypes(vals.size))
          next() match {
            case Punct(',') => ()
            case Punct(')') => vMore = false
            case other => err(s"expected ',' or ')' in VALUES row, got $other")
          }
        }
        if (vals.size != cols.size)
          err(s"row has ${vals.size} values for ${cols.size} columns")
        staged += cols.zip(vals).toMap
        if (peek.contains(Punct(','))) punct(',') else more = false
      }
      staged.foreach { r =>
        t.rows += ((t.nextSeq, r)); t.nextSeq += 1
      }
    }

    /** One literal, type-checked against the declared column type. */
    private def value(tpe: ColType): Any = peek match {
      case Some(Ident(s, false)) if s.equalsIgnoreCase("NULL") =>
        pos += 1
        if (!tpe.nullable) err(s"NULL into non-nullable ${tpe.text}")
        null
      case Some(Ident(s, false)) if s.equalsIgnoreCase("TRUE") ||
          s.equalsIgnoreCase("FALSE") =>
        pos += 1
        if (tpe.base != "Bool") err(s"boolean literal into ${tpe.text}")
        s.equalsIgnoreCase("TRUE")
      case Some(Ident("toDate", false)) =>
        pos += 1; punct('('); val d = str(); punct(')')
        if (tpe.base != "Date" && tpe.base != "Date32")
          err(s"toDate(…) into ${tpe.text}")
        LocalDate.parse(d)
      case Some(Ident("toDateTime", false)) =>
        pos += 1; punct('('); val d = str(); punct(')')
        if (tpe.base != "DateTime") err(s"toDateTime(…) into ${tpe.text}")
        LocalDateTime.parse(d, TsFmt)
      case Some(Str(s)) =>
        pos += 1
        tpe.base match {
          case "String" | "UUID" | "Unknown" | "Time" => s
          case other => err(s"string literal into $other")
        }
      case Some(Num(s)) =>
        pos += 1
        tpe.base match {
          case "Int8" | "Int16" | "Int32" | "Int64" | "Int128" | "Int256" |
              "UInt8" | "UInt16" | "UInt32" | "UInt64" | "UInt128" | "UInt256" =>
            if (s.contains('.') || s.toLowerCase.contains('e'))
              err(s"non-integral literal $s into ${tpe.text}")
            BigDecimal(s)
          case "Float32" | "Float64" | "Decimal" => BigDecimal(s)
          case "Bool" => // CH accepts 0/1 for Bool (null default renders 0)
            if (s != "0" && s != "1") err(s"numeric $s into Bool")
            s == "1"
          case other => err(s"numeric literal into $other")
        }
      case Some(Punct('[')) =>
        pos += 1
        if (tpe.base != "Array") err(s"array literal into ${tpe.text}")
        val inner = tpe.inner.get
        val elems = ArrayBuffer.empty[Any]
        if (peek.contains(Punct(']'))) pos += 1
        else {
          var more = true
          while (more) {
            elems += value(inner)
            next() match {
              case Punct(',') => ()
              case Punct(']') => more = false
              case other => err(s"expected ',' or ']' in array, got $other")
            }
          }
        }
        elems.toVector
      case other => err(s"expected literal, got $other")
    }

    // ALTER TABLE db.t DELETE WHERE (c = v AND …) OR …
    // ALTER TABLE db.t ADD COLUMN `c` Type COMMENT 's' [;]
    private def alter(): Unit = {
      kw("ALTER"); kw("TABLE")
      val (db, name) = qualifiedName()
      val t = table(db, name)
      if (isKw("DELETE")) {
        kw("DELETE"); kw("WHERE")
        val groups = ArrayBuffer.empty[Seq[(String, Any)]]
        var more = true
        while (more) {
          punct('(')
          val conj = ArrayBuffer.empty[(String, Any)]
          var cMore = true
          while (cMore) {
            val c = ident(); punct('=')
            conj += ((c, value(t.column(c).tpe)))
            if (isKw("AND")) kw("AND") else { punct(')'); cMore = false }
          }
          groups += conj.toSeq
          if (isKw("OR")) kw("OR") else more = false
        }
        val before = t.rows.size
        t.rows.filterInPlace { case (_, row) =>
          !groups.exists(_.forall { case (c, v) => valueEq(row(c), v) })
        }
        val _ = before
      } else {
        kw("ADD"); kw("COLUMN")
        val cName = next() match {
          case Ident(s, _) => s
          case other => err(s"expected column name, got $other")
        }
        val tpe = colType()
        var comment = ""
        if (isKw("COMMENT")) { kw("COMMENT"); comment = str() }
        if (t.columns.exists(_.name == cName))
          err(s"column $cName already exists in $db.$name")
        t.columns += new Column(cName, tpe, comment)
        // CH backfills the type default for pre-existing rows; model it
        // eagerly so later DELETE predicates and reads see the column
        val dflt = defaultFor(tpe)
        for (i <- t.rows.indices) {
          val (seq, row) = t.rows(i)
          if (!row.contains(cName)) t.rows(i) = (seq, row + (cName -> dflt))
        }
      }
    }

    private def truncate(): Unit = {
      kw("TRUNCATE"); kw("TABLE")
      val (db, name) = qualifiedName()
      table(db, name).rows.clear()
    }

    // select exists(select 1 from db.t)
    def existsProbe(): String = {
      kw("SELECT"); kw("EXISTS"); punct('(')
      kw("SELECT")
      num() match {
        case "1" => ()
        case other => err(s"expected SELECT 1, got SELECT $other")
      }
      kw("FROM")
      val (db, name) = qualifiedName()
      punct(')')
      if (table(db, name).rows.nonEmpty) "1" else "0"
    }
  }

  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y) == 0
    case (x, y) => x == y
  }

  /** ClickHouse's column default for rows that predate an ADD COLUMN. */
  private def defaultFor(tpe: ColType): Any =
    if (tpe.nullable) null
    else tpe.base match {
      case "Bool" => false
      case "String" | "UUID" | "Unknown" | "Time" => ""
      case "Date" | "Date32" => LocalDate.EPOCH
      case "DateTime" => LocalDateTime.of(1970, 1, 1, 0, 0, 0)
      case "Array" => Vector.empty
      case _ => BigDecimal(0)
    }
}
