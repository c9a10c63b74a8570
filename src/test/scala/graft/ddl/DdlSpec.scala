package graft.ddl

import org.scalatest.funsuite.AnyFunSuite
import graft.types.{CHColumn, CHType}

/** Golden DDL strings (reference: `src/adapter/mod.rs:53-141`). */
class DdlSpec extends AnyFunSuite {

  private val cols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true, comment = "the id"),
    CHColumn("name", CHType.CHStr.nullable, comment = "user's name"),
    CHColumn("ts", CHType.CHDateTime())
  )

  test("CREATE TABLE: engine, ORDER BY pk, settings, comment escaping") {
    val ddl = Ddl.createTableQuery("db", "users", cols,
      TableOptions(storagePolicy = Some("pol'icy")), tableComment = "it's a table")
    assert(ddl.contains("CREATE TABLE db.users"))
    assert(ddl.contains("`id` Int64 COMMENT 'the id'"))
    // column comments escape ' as " (adapter/mod.rs comment rule)
    assert(ddl.contains("`name` Nullable(String) COMMENT 'user\"s name'"))
    assert(ddl.contains("ENGINE = ReplacingMergeTree()"))
    assert(ddl.contains("ORDER BY (id)"))
    assert(ddl.contains("index_granularity = 8192"))
    assert(ddl.contains("min_age_to_force_merge_seconds = 60"))
    // table comment + storage policy escape ' as ''
    assert(ddl.contains("storage_policy = 'pol''icy'"))
    assert(ddl.contains("COMMENT 'it''s a table'"))
    assert(ddl.endsWith(";"))
  }

  test("CREATE TABLE without PK omits ORDER BY") {
    val ddl = Ddl.createTableQuery("db", "t", Seq(CHColumn("v", CHType.CHStr)))
    assert(!ddl.contains("ORDER BY"))
  }

  test("ADD COLUMN") {
    val q = Ddl.addColumnQuery("db", "t", CHColumn("c", CHType.Int32.nullable, comment = "a'b"))
    assert(q == "ALTER TABLE db.t ADD COLUMN `c` Nullable(Int32) COMMENT 'a\"b';")
  }

  test("drift reconciliation: missing columns added in source order, Unknown deferred") {
    val source = Seq(
      CHColumn("a", CHType.Int32),
      CHColumn("b", CHType.CHStr),
      CHColumn("c", CHType.Unknown), // first value null → deferred
      CHColumn("d", CHType.Bool)
    )
    val stmts = Ddl.reconcileDrift("db", "t", source, targetColumnNames = Set("a"))
    assert(stmts.size == 2)
    assert(stmts(0).contains("`b` String"))
    assert(stmts(1).contains("`d` Bool"))
  }

  test("TRUNCATE") {
    assert(Ddl.truncateQuery("db", "t") == "TRUNCATE TABLE db.t")
  }
}
