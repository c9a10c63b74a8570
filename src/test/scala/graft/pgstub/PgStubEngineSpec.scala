package graft.pgstub

import org.scalatest.funsuite.AnyFunSuite
import graft.pgstub.PgStubEngine.{Col, Insert}

/** Direct pins on the pgstub's SQL evaluator — the corners the
  * pipe-level LivePgPipeSpec drives only implicitly: scoping and
  * ambiguity rules, LEFT JOIN null rows, literal escaping, ordering,
  * IN lists, and strict grammar refusals. The stub must behave like
  * the server it stands in for, or its strictness proves nothing. */
class PgStubEngineSpec extends AnyFunSuite {

  private def engine(): PgStubEngine = {
    val e = new PgStubEngine
    e.createTable("public", "users", Seq(
      Col("id", "int8", nullable = false, pk = true),
      Col("name", "text", nullable = true, pk = false)))
    e.createTable("other", "users", Seq(
      Col("id", "int8", nullable = false, pk = true)))
    e
  }

  test("string literals use the '' escape; backslash is a literal byte") {
    val e = engine()
    // parses and evaluates: no publication named it's (or a\nb) exists
    assert(e.query("SELECT pubname FROM pg_publication WHERE pubname = 'it''s'")
      ._2.isEmpty)
    assert(e.query("""SELECT pubname FROM pg_publication WHERE pubname = 'a\nb'""")
      ._2.isEmpty)
    // unterminated literal refuses at the lexer
    assertThrows[IllegalArgumentException] {
      e.query("SELECT pubname FROM pg_publication WHERE pubname = 'oops")
    }
  }

  test("schema scoping: the WHERE clause separates same-named tables across schemas") {
    val e = engine()
    val (_, rows) = e.query(
      """SELECT c.column_name FROM information_schema.columns c
        |WHERE c.table_schema = 'public' AND c.table_name = 'users'
        |ORDER BY c.ordinal_position""".stripMargin)
    assert(rows.map(_(0)) == Seq("id", "name"))
    val (_, others) = e.query(
      """SELECT c.column_name FROM information_schema.columns c
        |WHERE c.table_schema = 'other' AND c.table_name = 'users'""".stripMargin)
    assert(others.map(_(0)) == Seq("id"))
  }

  test("unqualified column references resolve uniquely or refuse as ambiguous") {
    val e = engine()
    // single binding: bare names resolve
    assert(e.query("SELECT relname FROM pg_class WHERE relname = 'users'")
      ._2.size == 2) // one per schema
    // two bindings both exposing `oid`: a bare `oid` is ambiguous
    val ex = intercept[IllegalArgumentException] {
      e.query(
        """SELECT oid FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace
          |WHERE c.relname = 'users'""".stripMargin)
    }
    assert(ex.getMessage.contains("ambiguous"))
    // unknown bare name refuses
    val ex2 = intercept[IllegalArgumentException] {
      e.query("SELECT nope FROM pg_class")
    }
    assert(ex2.getMessage.contains("does not exist"))
  }

  test("LEFT JOIN emits a typed null row; inner JOIN drops the unmatched side") {
    val e = engine()
    // no comments exist → every pg_description LEFT JOIN misses, and the
    // COALESCE default must surface instead of an evaluation error
    val (_, rows) = e.query(
      """SELECT c.column_name, COALESCE(pgd.description, '-') AS d
        |FROM information_schema.columns c
        |LEFT JOIN pg_catalog.pg_statio_all_tables st
        |  ON st.schemaname = c.table_schema AND st.relname = c.table_name
        |LEFT JOIN pg_catalog.pg_description pgd
        |  ON pgd.objoid = st.relid AND pgd.objsubid = c.ordinal_position
        |WHERE c.table_schema = 'public' AND c.table_name = 'users'
        |ORDER BY c.ordinal_position""".stripMargin)
    assert(rows.map(r => (r(0), r(1))) == Seq(("id", "-"), ("name", "-")))
  }

  test("IN lists and ORDER BY evaluate; unknown relations and functions refuse") {
    val e = engine()
    val (_, rows) = e.query(
      """SELECT c.oid, n.nspname, c.relname
        |FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace
        |WHERE n.nspname = 'public' AND c.relname IN ('users', 'missing')""".stripMargin)
    assert(rows.size == 1 && rows.head(2) == "users")
    assertThrows[IllegalArgumentException] {
      e.query("SELECT x FROM no_such_catalog")
    }
    assertThrows[IllegalArgumentException] {
      e.query("SELECT mystery_function('a')")
    }
    assertThrows[IllegalArgumentException] { // SRF position is strict too
      e.query("SELECT a FROM mystery_srf('x')")
    }
  }

  test("the NULL-vs-equality rule: NULL = x never matches (no null row leaks through ON)") {
    val e = engine()
    e.commit(1L, Seq(Insert("public", "users", Seq(Some("1"), None))))
    // pg_statio LEFT JOIN against a table named like no real relation:
    // the null row's relid must not equal any objoid
    val (_, rows) = e.query(
      """SELECT c.column_name FROM information_schema.columns c
        |LEFT JOIN pg_catalog.pg_statio_all_tables st
        |  ON st.schemaname = c.table_schema AND st.relname = 'nope'
        |LEFT JOIN pg_catalog.pg_description pgd ON pgd.objoid = st.relid
        |WHERE c.table_schema = 'public' AND c.table_name = 'users'""".stripMargin)
    assert(rows.size == 2) // null-extended, never multiplied or dropped
  }

  test("reltuples casts to bigint; regclass rejects unknown relations") {
    val e = engine()
    e.seed("public", "users", Seq(Seq(Some("1"), Some("a"))))
    val (_, rows) = e.query(
      """SELECT reltuples::bigint FROM pg_class
        |WHERE oid = ('"public"."users"')::regclass""".stripMargin)
    assert(rows.map(_(0)) == Seq(1L))
    val ex = intercept[IllegalArgumentException] {
      e.query("""SELECT reltuples::bigint FROM pg_class
        |WHERE oid = ('"public"."ghost"')::regclass""".stripMargin)
    }
    assert(ex.getMessage.contains("does not exist"))
  }
}
