package graft.live

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.pipe.{FileOffsetStore, StatementPipe}
import graft.sinks.{AnsiDialect, StatementSink}
import graft.types.{CHColumn, CHType}

/** The live JDBC path end-to-end against EMBEDDED DERBY — a real JDBC
  * endpoint, not a collector: peek protocol, catalog introspection via
  * metadata, distributed INSERT execution, the full statement sequence
  * (truncate → inserts → deletes), the at-least-once write-failure replay,
  * and offset commit ordering.
  *
  * Derby in-memory databases are shared across connections within one JVM
  * by name, so executor-side connections in local mode hit the same
  * database — the executor-opens-its-own-connection model is exercised for
  * real.
  */
class LiveJdbcSpec extends AnyFunSuite with SparkTestBase {

  private def mem(name: String) = s"jdbc:derby:memory:$name;create=true"

  private def freshDb(name: String): JdbcClient = {
    val c = new JdbcClient(JdbcConnInfo(mem(name)))
    assert(c.ping())
    c
  }

  private val cols = Seq(
    CHColumn("id", CHType.Int64, isPrimaryKey = true),
    CHColumn("v", CHType.CHStr.nullable))

  test("JdbcClient: execute / query / scalar / queryDf round-trip") {
    val c = freshDb("client")
    try {
      c.execute("CREATE TABLE t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(50))")
      c.execute("INSERT INTO t VALUES (1, 'a'), (2, 'it''s'), (3, NULL)")
      assert(c.queryScalar("SELECT COUNT(*) FROM t").map(_.toString.toLong).contains(3L))
      val (schema, rows) = c.query("SELECT id, v FROM t ORDER BY id")
      assert(schema.fieldNames.toSeq == Seq("id", "v"))
      assert(rows.map(r => (r.get(0), r.get(1))) ==
        Vector((1L, "a"), (2L, "it's"), (3L, null)))
      val df = c.queryDf(spark, "SELECT id, v FROM t ORDER BY id")
      assert(df.count() == 3)
      assert(df.filter("v IS NULL").count() == 1)
    } finally c.close()
  }

  test("JdbcClient metadata introspection: columns + primary keys (S5)") {
    val c = freshDb("meta")
    try {
      c.execute(
        """CREATE TABLE snap (id BIGINT NOT NULL, ts TIMESTAMP, val DOUBLE,
          |  name VARCHAR(20) NOT NULL, PRIMARY KEY (id))""".stripMargin)
      val colsMeta = c.tableColumns(None, "SNAP")
      assert(colsMeta.map(_._1) == Seq("id", "ts", "val", "name"))
      assert(colsMeta.find(_._1 == "id").exists(!_._3)) // PK non-nullable
      assert(colsMeta.find(_._1 == "ts").exists(_._3))
      assert(c.primaryKeys(None, "SNAP") == Seq("id"))
    } finally c.close()
  }

  test("columnsOf: exact table match (no `_` wildcard leak), schema scoping, raw case, case variants") {
    val c = freshDb("colsof")
    try {
      c.execute("CREATE TABLE user_events (id BIGINT NOT NULL, v VARCHAR(10))")
      c.execute("CREATE TABLE user1events (other BIGINT, thing DOUBLE, extra INT)")
      // `_` in a JDBC name argument is a search-pattern wildcard; an
      // unfiltered probe would merge user1events' columns in
      assert(c.columnsOf(Some("APP"), "user_events").map(_._1.toLowerCase)
        == Seq("id", "v"))
      // lookup works regardless of the case the caller uses
      assert(c.columnsOf(Some("app"), "USER_EVENTS").map(_._1.toLowerCase)
        == Seq("id", "v"))
      // raw case preserved: quoted mixed-case columns come back verbatim
      c.execute("""CREATE TABLE cased ("userName" VARCHAR(10), "age" INT)""")
      assert(c.columnsOf(Some("APP"), "cased").map(_._1) == Seq("userName", "age"))
      // a schema that doesn't hold the table → empty (absent): scoped
      // probes never fall back to finding the table elsewhere
      assert(c.columnsOf(Some("NOSUCHSCHEMA"), "user_events").isEmpty)
      assert(c.columnsOf(None, "user_events").map(_._1.toLowerCase) == Seq("id", "v"))
      assert(c.columnsOf(Some("APP"), "missing_table").isEmpty)
    } finally c.close()
  }

  test("JdbcExec executes rendered INSERT statements per partition on executors") {
    val c = freshDb("exec")
    try {
      c.execute("CREATE TABLE sink (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      import spark.implicits._
      val stmts = (1 to 40).map(i => s"INSERT INTO sink VALUES ($i, 'r$i')")
        .toDS().repartition(4)
      val n = JdbcExec.executePartitions(stmts, JdbcConnInfo(mem("exec")))
      assert(n == 40)
      assert(c.queryScalar("SELECT COUNT(*) FROM sink").map(_.toString.toLong).contains(40L))
    } finally c.close()
  }

  test("JdbcChangelogSource peeks bounded WAL-ordered batches; peek does not consume") {
    val c = freshDb("peek")
    try {
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      c.execute("INSERT INTO changelog VALUES " +
        (1 to 10).map(i => s"($i, 'I', $i, 'v$i')").mkString(", "))
      val src = new JdbcChangelogSource(c,
        JdbcChangelogSource.tablePeekSql("changelog"), () => spark.emptyDataFrame)(spark)
      val b1 = src.peekChanges(0, 4)
      assert(b1.count() == 4 && src.maxSeq(b1).contains(4L))
      // non-consuming: the same peek returns the same rows
      assert(src.peekChanges(0, 4).collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
      val b2 = src.peekChanges(4, 100)
      assert(b2.count() == 6 && src.maxSeq(b2).contains(10L))

      // stability watermark: horizon 2 holds back the newest 2 seqs as an
      // in-flight buffer (non-commit-ordered writers), so the peek tops
      // out at max(seq) - 2 = 8 regardless of the limit
      val guarded = new JdbcChangelogSource(c,
        JdbcChangelogSource.tablePeekSql("changelog", stabilityHorizon = 2),
        () => spark.emptyDataFrame)(spark)
      val g = guarded.peekChanges(0, 100)
      assert(guarded.maxSeq(g).contains(8L) && g.count() == 8)
    } finally c.close()
  }

  test("StatementPipe against Derby: snapshot + CDC batches, distributed inserts, chunked deletes") {
    val c = freshDb("pipe")
    val tmp = java.nio.file.Files.createTempDirectory("graft-live").toString
    try {
      c.execute("CREATE TABLE snap (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      c.execute("INSERT INTO snap VALUES (1, 'a'), (2, 'b')")
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      // covers: one in-batch last-wins dedup pair (id 10 twice in batch 1),
      // delete of a snapshotted key, and a CROSS-BATCH re-upsert (id 11
      // inserted in batch 1, updated in batch 2) — the ANSI dialect's
      // delete-keys-then-insert upsert makes that hit the live PK cleanly
      // instead of violating the constraint
      c.execute("INSERT INTO changelog VALUES " +
        "(1, 'I', 10, 'x0'), (2, 'U', 10, 'x1'), (3, 'I', 11, 'y'), " +
        "(4, 'D', 2, NULL), (5, 'I', 12, 'z'), (6, 'U', 11, 'y2')")
      c.execute("CREATE TABLE target (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")

      val info = JdbcConnInfo(mem("pipe"))
      val src = new JdbcChangelogSource(c,
        JdbcChangelogSource.tablePeekSql("changelog"),
        JdbcChangelogSource.snapshotScan(spark, info, "snap"))(spark)
      val sink = new StatementSink("APP", "target", cols, c.execute,
        copyBatchSize = 2, dialect = AnsiDialect,
        insertExec = Some(info), deleteChunkSize = 1)(spark)
      val cfg = PipeConfig(SourceConfig("jdbc"), TargetConfig("jdbc"),
        peek_changes_limit = Some(3L)) // forces 2 CDC iterations
      val offsets = new FileOffsetStore(s"$tmp/o.offset")
      val probe = () => c.queryScalar("SELECT COUNT(*) FROM target")
        .exists(_.toString.toLong > 0)
      val pipe = new StatementPipe(cfg, src, sink, offsets, cols,
        targetNonEmpty = probe, sleeper = _ => ())(spark)

      assert(pipe.firstSync())
      assert(c.queryScalar("SELECT COUNT(*) FROM target").map(_.toString.toLong).contains(2L))
      assert(!pipe.firstSync()) // K6: non-empty target skips the copy

      val applied = pipe.syncLoop()
      assert(applied == 6)
      val (_, rows) = c.query("SELECT id, v FROM target ORDER BY id")
      assert(rows.map(r => (r.get(0), r.get(1))) ==
        Vector((1L, "a"), (10L, "x1"), (11L, "y2"), (12L, "z")))
      assert(offsets.read() == 6L)
    } finally c.close()
  }

  test("multi-table slot routing: one decoded batch feeds every table; advance after ALL writes") {
    import org.apache.spark.sql.functions.{col => c}
    import spark.implicits._
    // decoded multi-relation changelog (the PgOutputJdbcSource.decodeFrames
    // output shape): both tables interleaved in one slot window
    val decoded = Seq(
      (1L, "I", "users",  Seq("1", "ada")),
      (2L, "I", "orders", Seq("10", "99.5")),
      (3L, "U", "users",  Seq("1", "ada l.")),
      (4L, "D", "orders", Seq("10", null))
    ).toDF("seq", "op", "table", "cols")
    val rels = Seq(
      PgRelation(101L, "users", Seq("id", "name")),
      PgRelation(102L, "orders", Seq("id", "total")))

    val routed = PgOutputJdbcSource.multiTableSlices(decoded, rels)
    // every event of BOTH tables survives the single decode
    assert(routed.count() == 4)
    assert(routed.columns.toSet == Set("seq", "op", "table", "id", "name", "total"))
    assert(routed.filter(c("table") === "users").count() == 2)

    // drive it through MultiTablePipe into per-table EXECUTING sinks
    val db = freshDb("multiroute")
    val tmp = java.nio.file.Files.createTempDirectory("graft-multiroute").toString
    try {
      db.execute("CREATE TABLE users (id BIGINT NOT NULL PRIMARY KEY, name VARCHAR(20))")
      db.execute("CREATE TABLE orders (id BIGINT NOT NULL PRIMARY KEY, total DOUBLE)")
      val userCols = Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("name", CHType.CHStr.nullable))
      val orderCols = Seq(CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("total", CHType.Float64.nullable))
      def sinkFor(table: String, cols: Seq[CHColumn]) =
        new graft.sinks.StatementSink("APP", table, cols, db.execute,
          dialect = graft.sinks.AnsiDialect)(spark)
          .asBatchSink(() => db.queryScalar(
            graft.sinks.AnsiDialect.nonEmptyProbe("APP", table))
            .exists(graft.sinks.SqlDialect.truthy))
      val tables = Map(
        "users" -> graft.pipe.TableSpec(userCols, sinkFor("users", userCols)),
        "orders" -> graft.pipe.TableSpec(orderCols, sinkFor("orders", orderCols)))

      var advanced = List.empty[Long]
      val offsets = new graft.pipe.FileOffsetStore(s"$tmp/o.offset") {
        override def write(o: Long): Unit = { super.write(o); advanced ::= o }
      }
      val source = new graft.pipe.CdcSource {
        def snapshot() = spark.emptyDataFrame
        def peekChanges(after: Long, limit: Long) =
          routed.filter(c("seq") > after).orderBy(c("seq")).limit(limit.toInt)
      }
      val cfg = graft.config.PipeConfig(
        graft.config.SourceConfig("jdbc"), graft.config.TargetConfig("jdbc"))
      val pipe = new graft.pipe.MultiTablePipe(cfg, source, tables, offsets)(spark)
      assert(pipe.syncLoop() == 4L)

      // both tables applied from the one shared batch; advance ran once,
      // AFTER all table writes, at the batch max seq
      assert(advanced == List(4L))
      assert(db.query("SELECT id, name FROM users")._2
        .map(r => (r.get(0), r.get(1))) == Vector((1L, "ada l.")))
      assert(db.queryScalar("SELECT COUNT(*) FROM orders").map(_.toString.toLong).contains(0L))
    } finally db.close()
  }

  test("write failure: sleep, re-peek the same offset, replay the batch (at-least-once)") {
    val c = freshDb("retry")
    val tmp = java.nio.file.Files.createTempDirectory("graft-retry").toString
    try {
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      c.execute("INSERT INTO changelog VALUES (1, 'I', 1, 'a'), (2, 'I', 2, 'b')")
      c.execute("CREATE TABLE target (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")

      var failures = 2
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val flakyExec: String => Unit = { sql =>
        if (failures > 0) { failures -= 1; sys.error("endpoint down") }
        c.execute(sql)
      }
      val src = new JdbcChangelogSource(c,
        JdbcChangelogSource.tablePeekSql("changelog"), () => spark.emptyDataFrame)(spark)
      // driver-side execution (insertExec = None) so the flaky executor is hit
      val sink = new StatementSink("APP", "target", cols, flakyExec,
        dialect = AnsiDialect)(spark)
      val cfg = PipeConfig(SourceConfig("jdbc"), TargetConfig("jdbc"),
        sleep_millis_when_write_failed = Some(77L))
      val offsets = new FileOffsetStore(s"$tmp/o.offset")
      val pipe = new StatementPipe(cfg, src, sink, offsets, cols,
        sleeper = sleeps += _)(spark)

      val applied = pipe.syncLoop(maxIterations = 5)
      // two failed attempts (slept 77 each), then the replayed batch lands
      assert(sleeps.count(_ == 77L) == 2)
      assert(applied == 2)
      assert(offsets.read() == 2L)
      val (_, rows) = c.query("SELECT id, v FROM target ORDER BY id")
      assert(rows.map(r => (r.get(0), r.get(1))) == Vector((1L, "a"), (2L, "b")))
    } finally c.close()
  }

  test("peek failure: sleep sleepWhenPeekFailed and retry without advancing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-peekfail").toString
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var peekFailures = 2
    val c = freshDb("peekfail")
    try {
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      c.execute("INSERT INTO changelog VALUES (1, 'I', 1, 'a')")
      c.execute("CREATE TABLE target (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      val inner = new JdbcChangelogSource(c,
        JdbcChangelogSource.tablePeekSql("changelog"), () => spark.emptyDataFrame)(spark)
      val flakySrc = new graft.pipe.CdcSource {
        def snapshot() = inner.snapshot()
        def peekChanges(after: Long, limit: Long) = {
          if (peekFailures > 0) { peekFailures -= 1; sys.error("peek down") }
          inner.peekChanges(after, limit)
        }
      }
      val sink = new StatementSink("APP", "target", cols, c.execute,
        dialect = AnsiDialect)(spark)
      val cfg = PipeConfig(SourceConfig("jdbc"), TargetConfig("jdbc"),
        sleep_millis_when_peek_failed = Some(55L))
      val pipe = new StatementPipe(cfg, flakySrc, sink,
        new FileOffsetStore(s"$tmp/o.offset"), cols, sleeper = sleeps += _)(spark)
      val applied = pipe.syncLoop(maxIterations = 5)
      assert(sleeps.count(_ == 55L) == 2)
      assert(applied == 1)
    } finally c.close()
  }
}
