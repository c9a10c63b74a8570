package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class CatalogSqlSpec extends AnyFunSuite {

  test("column listing query shape") {
    val q = CatalogSql.pgColumns("public", "users")
    assert(q.contains("information_schema.columns"))
    assert(q.contains("PRIMARY KEY"))
    assert(q.contains("pg_description"))
    assert(q.contains("ORDER BY c.ordinal_position"))
  }

  test("peek is non-consuming and bounded") {
    val q = CatalogSql.pgPeekChanges("clockpipe_slot", "clockpipe_publication", 65536)
    assert(q.contains("pg_logical_slot_peek_binary_changes"))
    assert(q.contains("65536"))
    assert(q.contains("'proto_version', '1'"))
  }

  test("advance, estimate, emptiness probe, CH columns") {
    assert(CatalogSql.pgAdvanceSlot("s", "0/16B3748") ==
      "SELECT pg_replication_slot_advance('s', '0/16B3748')")
    assert(CatalogSql.pgRowEstimate("public", "t").contains("reltuples"))
    assert(CatalogSql.chTableNonEmpty("benchmark", "t") ==
      "select exists(select 1 from benchmark.t)")
    assert(CatalogSql.chColumns("db", "t").contains("system.columns"))
    assert(CatalogSql.pgRelationIds("public", Seq("a", "b")).contains("'a', 'b'"))
  }
}
