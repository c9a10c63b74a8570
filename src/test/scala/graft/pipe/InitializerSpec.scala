package graft.pipe

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.live.{JdbcClient, JdbcConnInfo}
import graft.sinks.{AnsiDialect, ClickHouseDialect, StatementSink}
import graft.sources.CatalogSql
import graft.types.{CHColumn, CHType}

/** The initialize phase end-to-end (reference lifecycle step 1,
  * `src/pipes/postgres.rs:110-120`): publication + slot setup against a
  * scripted PG-catalog fake (stateful — CREATE/ALTER mutate what the next
  * probe sees, as the live catalog would), and target-table setup against
  * EMBEDDED DERBY, where the emitted DDL must actually execute and the
  * pipe must then sync into the tables it just created.
  */
class InitializerSpec extends AnyFunSuite with SparkTestBase {

  private val pub = "clockpipe_publication"
  private val slot = "clockpipe_slot"
  private val twoTables = Seq(("public", "users"), ("public", "orders"))

  /** Minimal stateful PG catalog: understands exactly the statements the
    * initializer issues and answers exactly the probes it runs. */
  private class FakePg(
      var published: Option[Set[(String, String)]],
      var slots: Set[String]) {
    val executed = ArrayBuffer.empty[String]

    def query(sql: String): Seq[Row] =
      if (sql == CatalogSql.pgFindPublication(pub))
        published.toSeq.map(_ => Row(pub))
      else if (sql == CatalogSql.pgPublicationTables(pub))
        published.getOrElse(Set.empty).toSeq.map { case (s, t) => Row(s, t) }
      else if (sql == CatalogSql.pgFindSlot(slot))
        slots.filter(_ == slot).toSeq.map(s => Row(s, "reserved"))
      else fail(s"unexpected catalog probe: $sql")

    def execute(sql: String): Unit = {
      executed += sql
      def parseTables(list: String): Set[(String, String)] =
        list.split(",").map(_.trim.split('.')).map(a => (a(0), a(1))).toSet
      if (sql.startsWith(s"CREATE PUBLICATION $pub FOR TABLE "))
        published = Some(parseTables(sql.stripPrefix(s"CREATE PUBLICATION $pub FOR TABLE ")))
      else if (sql.startsWith(s"ALTER PUBLICATION $pub ADD TABLE "))
        published = Some(published.getOrElse(Set.empty) ++
          parseTables(sql.stripPrefix(s"ALTER PUBLICATION $pub ADD TABLE ")))
      else if (sql == CatalogSql.pgCreateSlot(slot)) slots += slot
      else fail(s"unexpected statement: $sql")
    }
  }

  test("setupPublication, fresh server: CREATE PUBLICATION over all tables + slot; no ALTER") {
    val pg = new FakePg(published = None, slots = Set.empty)
    val stmts = Initializer.setupPublication(
      pg.query, pg.execute, pub, slot, twoTables)
    assert(stmts == Seq(
      s"CREATE PUBLICATION $pub FOR TABLE public.users, public.orders",
      s"SELECT pg_create_logical_replication_slot('$slot', 'pgoutput')"))
    assert(stmts == pg.executed.toSeq)
    assert(pg.published.contains(twoTables.toSet) && pg.slots == Set(slot))
  }

  test("setupPublication, existing publication missing a table: reconcile with ALTER only") {
    val pg = new FakePg(
      published = Some(Set(("public", "users"))), slots = Set(slot))
    val stmts = Initializer.setupPublication(
      pg.query, pg.execute, pub, slot, twoTables)
    assert(stmts == Seq(s"ALTER PUBLICATION $pub ADD TABLE public.orders"))
    assert(pg.published.contains(twoTables.toSet))
  }

  test("setupPublication, everything exists: zero statements (idempotent re-run)") {
    val pg = new FakePg(published = Some(twoTables.toSet), slots = Set(slot))
    assert(Initializer.setupPublication(
      pg.query, pg.execute, pub, slot, twoTables).isEmpty)
  }

  test("setupPublication with zero configured tables is a hard config error") {
    val pg = new FakePg(published = None, slots = Set.empty)
    intercept[IllegalArgumentException](
      Initializer.setupPublication(pg.query, pg.execute, pub, slot, Nil))
    assert(pg.executed.isEmpty)
  }

  private def mem(name: String) = s"jdbc:derby:memory:$name;create=true"

  private def probe(c: JdbcClient, table: String): () => Seq[String] =
    () => c.tableColumns(None, table.toUpperCase) match {
      case Seq() => c.tableColumns(None, table).map(_._1)
      case found => found.map(_._1)
    }

  private val baseCols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true),
    CHColumn("v", CHType.CHStr.nullable))

  test("setupTable against Derby: fresh target CREATEs, drift ADD COLUMNs, in-sync no-ops") {
    val c = new JdbcClient(JdbcConnInfo(mem("init")))
    try {
      // (a) fresh target: CREATE TABLE executes and the table is usable
      val s1 = Initializer.setupTable(
        probe(c, "t1"), c.execute, AnsiDialect, "APP", "t1", baseCols)
      assert(s1 == Seq(
        "CREATE TABLE APP.t1 (id BIGINT NOT NULL, v VARCHAR(32672), PRIMARY KEY (id))"))
      c.execute("INSERT INTO APP.t1 VALUES (1, 'a')")

      // (b) drifted source: one new column → one ADD COLUMN, existing rows
      // read NULL for it
      val drifted = baseCols :+ CHColumn("age", CHType.Int32.nullable)
      val s2 = Initializer.setupTable(
        probe(c, "t1"), c.execute, AnsiDialect, "APP", "t1", drifted)
      assert(s2 == Seq("ALTER TABLE APP.t1 ADD COLUMN age INTEGER"))
      assert(c.query("SELECT age FROM APP.t1")._2.map(_.get(0)) == Vector(null))

      // (c) in sync: re-run emits nothing
      assert(Initializer.setupTable(
        probe(c, "t1"), c.execute, AnsiDialect, "APP", "t1", drifted).isEmpty)

      // Unknown-typed columns defer creation (Mongo null-first fields)
      val withUnknown = drifted :+ CHColumn("later", CHType.Unknown)
      assert(Initializer.setupTable(
        probe(c, "t1"), c.execute, AnsiDialect, "APP", "t1", withUnknown).isEmpty)
    } finally c.close()
  }

  test("drift membership is case-insensitive: case-folded target names never re-ADD a held column") {
    val collected = ArrayBuffer.empty[String]
    // a case-folding target reports `userId` back as USERID — a restart
    // must see the schema as in-sync, not re-issue ADD COLUMN forever
    val src = Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
      CHColumn("userId", CHType.Int32.nullable))
    assert(Initializer.setupTable(
      () => Seq("ID", "USERID"), collected += _, AnsiDialect,
      "APP", "t", src).isEmpty)
    // a genuinely-new column still emits, with the SOURCE's case
    val s2 = Initializer.setupTable(
      () => Seq("ID", "USERID"), collected += _, ClickHouseDialect,
      "APP", "t", src :+ CHColumn("newCol", CHType.Int32.nullable))
    assert(s2 == Seq("ALTER TABLE APP.t ADD COLUMN `newCol` Nullable(Int32) COMMENT '';"))
  }

  test("ANSI DDL rejects non-identifier column names instead of emitting injectable SQL") {
    for (bad <- Seq("a b", "x; DROP TABLE users", "weird\"quote", "")) {
      val e = intercept[IllegalArgumentException](AnsiDialect.addColumnQuery(
        "APP", "t", CHColumn(bad, CHType.CHStr.nullable)))
      assert(e.getMessage.contains("identifier"))
      intercept[IllegalArgumentException](AnsiDialect.createTableQuery(
        "APP", "t", Seq(CHColumn(bad, CHType.CHStr.nullable))))
    }
    // leading underscore (Mongo `_id`) and digits after the head are fine
    assert(AnsiDialect.addColumnQuery("APP", "t",
      CHColumn("_id2", CHType.CHStr.nullable))
      .endsWith("ADD COLUMN _id2 VARCHAR(32672)"))
  }

  test("setupTable renders the reference's ClickHouse DDL byte-for-byte through the dialect") {
    val collected = ArrayBuffer.empty[String]
    val stmts = Initializer.setupTable(
      () => Seq.empty, collected += _, ClickHouseDialect,
      "analytics", "users", baseCols, tableComment = "it's users")
    assert(stmts == Seq(graft.ddl.Ddl.createTableQuery(
      "analytics", "users", baseCols, tableComment = "it's users")))
    assert(collected.toSeq == stmts)

    val drift = Initializer.setupTable(
      () => Seq("id", "v"), collected += _, ClickHouseDialect,
      "analytics", "users", baseCols :+ CHColumn("age", CHType.Int32.nullable))
    assert(drift == Seq(
      "ALTER TABLE analytics.users ADD COLUMN `age` Nullable(Int32) COMMENT '';"))
  }

  test("full lifecycle on Derby: initialize creates the targets, then the pipe syncs into them") {
    import org.apache.spark.sql.functions.{col => cf}
    import spark.implicits._
    val db = new JdbcClient(JdbcConnInfo(mem("initlife")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-initlife").toString
    try {
      val userCols = Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("name", CHType.CHStr.nullable))
      val orderCols = Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("total", CHType.Float64.nullable))

      // initialize: NO pre-created target tables — the initializer makes them
      for ((t, cols) <- Seq(("users", userCols), ("orders", orderCols))) {
        val made = Initializer.setupTable(
          probe(db, t), db.execute, AnsiDialect, "APP", t, cols)
        assert(made.sizeIs == 1 && made.head.startsWith(s"CREATE TABLE APP.$t"))
      }

      val decoded = Seq(
        (1L, "I", "users", 1L, "ada", null.asInstanceOf[java.lang.Double]),
        (2L, "I", "orders", 10L, null, java.lang.Double.valueOf(99.5)),
        (3L, "U", "users", 1L, "ada l.", null.asInstanceOf[java.lang.Double])
      ).toDF("seq", "op", "table", "id", "name", "total")
      def sinkFor(table: String, cols: Seq[CHColumn]) =
        new StatementSink("APP", table, cols, db.execute, dialect = AnsiDialect)(spark)
          .asBatchSink(() => db.queryScalar(
            AnsiDialect.nonEmptyProbe("APP", table))
            .exists(graft.sinks.SqlDialect.truthy))
      val tables = Map(
        "users" -> TableSpec(userCols, sinkFor("users", userCols)),
        "orders" -> TableSpec(orderCols, sinkFor("orders", orderCols)))
      val source = new CdcSource {
        def snapshot() = spark.emptyDataFrame
        def peekChanges(after: Long, limit: Long) =
          decoded.filter(cf("seq") > after).orderBy(cf("seq")).limit(limit.toInt)
      }
      val cfg = graft.config.PipeConfig(
        graft.config.SourceConfig("jdbc"), graft.config.TargetConfig("jdbc"))
      val pipe = new MultiTablePipe(cfg, source, tables,
        new FileOffsetStore(s"$tmp/o.offset"))(spark)
      assert(pipe.syncLoop() == 3L)

      assert(db.query("SELECT id, name FROM users")._2
        .map(r => (r.get(0), r.get(1))) == Vector((1L, "ada l.")))
      assert(db.query("SELECT id, total FROM orders")._2
        .map(r => (r.get(0), r.get(1))) == Vector((10L, 99.5)))
    } finally db.close()
  }
}
