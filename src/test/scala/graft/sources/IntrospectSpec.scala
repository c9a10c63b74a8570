package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.types.CHType

class IntrospectSpec extends AnyFunSuite with SparkTestBase {

  test("lineitem introspection: 1-based indexes, composite PK, type map") {
    val cols = Introspect.table(spark, "/root/testdata/sf0.001", "lineitem")
    assert(cols.map(_._1) == (1 to cols.size))
    val byName = cols.map { case (_, c) => c.name -> c }.toMap
    assert(byName("l_orderkey").isPrimaryKey)
    assert(byName("l_linenumber").isPrimaryKey)
    assert(!byName("l_quantity").isPrimaryKey)
    assert(byName("l_orderkey").chType == CHType.Int64)
    assert(byName("l_returnflag").chType.stripNullable == CHType.CHStr)
    assert(byName("l_shipdate").chType.stripNullable == CHType.CHDateTime())
  }

  test("events introspection works through the nanos-ts reader") {
    val cols = Introspect.table(spark, "/root/testdata/sf0.001", "events")
    val byName = cols.map { case (_, c) => c.name -> c }.toMap
    assert(byName("event_id").isPrimaryKey)
    assert(byName("ts").chType.stripNullable == CHType.CHDateTime())
  }
}
