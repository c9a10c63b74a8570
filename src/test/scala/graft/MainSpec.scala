package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.config.PipeConfig

/** EP1: config-file load → dispatch → full pipe run (SURVEY.md sec 3). */
class MainSpec extends AnyFunSuite with SparkTestBase {

  test("run with parquet replay config materializes the user_state table") {
    val out = Files.createTempDirectory("graft-main").toString
    val cfgPath = s"$out/cfg.json"
    Files.writeString(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "source": {"source_type": "parquet", "parquet_dir": "/root/testdata/sf0.001"},
         |  "target": {"target_type": "parquet", "parquet_dir": "$out"},
         |  "peek_changes_limit": 200
         |}""".stripMargin)
    val config = PipeConfig.fromFile(cfgPath)
    assert(config.peekChangesLimit == 200L)

    Main.runWith(spark, config)

    val state = spark.read.parquet(s"$out/user_state/log")
    assert(state.count() > 0)
    // the materialized view equals the declarative final state
    val sink = new graft.pipe.ParquetStateSink(s"$out/user_state",
      Seq("user_id"), Seq("last_ts", "total_value", "n_events"))(spark)
    assert(sink.read().count() > 0)
  }

  test("unknown source type is rejected; postgres dispatches to the live path") {
    val cfg = PipeConfig.fromJson(
      """{"source": {"source_type": "kafka"}, "target": {"target_type": "parquet"}}""")
    intercept[IllegalArgumentException](Main.runWith(spark, cfg))

    // postgres is IMPLEMENTED: with a config it proceeds to the live
    // connection (which fails here only because no server/driver exists in
    // the sandbox — NOT with the round-1 "requires a live endpoint" error)
    val pgCfg = PipeConfig.fromJson(
      """{"source": {"source_type": "postgres", "postgres": {
        |   "connection": {"host": "localhost", "port": 5432, "database": "d"},
        |   "tables": [{"table_name": "t"}]}},
        | "target": {"target_type": "parquet", "parquet_dir": "/tmp/never"}}""".stripMargin)
    val e = intercept[Exception](Main.runWith(spark, pgCfg))
    assert(!e.getMessage.contains("not supported"))
  }

  test("mongodb replay config: recorded change stream → inferred schema → state, token persisted") {
    import graft.mongo.{Bson, BsonValue}
    import BsonValue._
    val out = Files.createTempDirectory("graft-main-mongo").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$out/bson"))

    def oid(i: Int) = BObjId(Vector.tabulate(12)(j => (i * 16 + j).toByte))
    def ev(op: String, id: BsonValue, token: String, full: Option[BDoc]): Array[Byte] = {
      val f = Vector.newBuilder[(String, BsonValue)]
      f += "_id" -> BDoc(Vector("_data" -> BStr(token)))
      f += "operationType" -> BStr(op)
      f += "ns" -> BDoc(Vector("db" -> BStr("app"), "coll" -> BStr("users")))
      f += "documentKey" -> BDoc(Vector("_id" -> id))
      full.foreach(d => f += "fullDocument" -> d)
      Bson.encodeDocument(BDoc(f.result()))
    }
    // the recorded stream: 2 inserts, an UpdateLookup update, a delete
    val stream: Array[Byte] = Array(
      ev("insert", oid(1), "t1", Some(BDoc(Vector(
        "_id" -> oid(1), "name" -> BStr("ada"), "age" -> BInt32(36))))),
      ev("insert", oid(2), "t2", Some(BDoc(Vector(
        "_id" -> oid(2), "name" -> BStr("alan"), "age" -> BInt32(41))))),
      ev("update", oid(1), "t3", Some(BDoc(Vector(
        "_id" -> oid(1), "name" -> BStr("ada l."), "age" -> BInt32(37))))),
      ev("delete", oid(2), "t4", None)).flatten
    Files.write(java.nio.file.Paths.get(s"$out/bson/users.bson"), stream)

    val cfg = PipeConfig.fromJson(
      s"""{
         |  "source": {"source_type": "mongodb", "mongodb": {
         |    "connection": {"host": "unused", "port": 0, "database": "app"},
         |    "collections": [{"table_name": "users"}],
         |    "bson_dir": "$out/bson",
         |    "resume_token_path": "$out/token.json"}},
         |  "target": {"target_type": "parquet", "parquet_dir": "$out"},
         |  "peek_changes_limit": 2
         |}""".stripMargin)
    Main.runWith(spark, cfg)

    // schema inferred first-type-wins: _id PK + name + age
    val sink = new graft.pipe.ParquetStateSink(s"$out/users",
      Seq("_id"), Seq("name", "age"))(spark)
    // age inferred as Int32 (first value was BInt32 — first-type-wins)
    val state = sink.read().orderBy("_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(state == Seq((oid(1).hex, "ada l.", 37)))
    // resume token committed through the offset-write commit point
    assert(new graft.pipe.ResumeTokenStore(s"$out/token.json").read().contains("t4"))
  }

  test("mongo multi-collection jdbc target: each collection routes to its own table") {
    // configured target.jdbc.table names a SINGLE table — with two
    // collections it must NOT be shared: mixed schema evolution and
    // colliding _id-keyed upserts/deletes. Each collection routes to a
    // table named after it, mirroring the PG multi-table path.
    def cfg(colls: String) = PipeConfig.fromJson(
      s"""{
         |  "source": {"source_type": "mongodb", "mongodb": {
         |    "connection": {"host": "unused", "port": 0, "database": "app"},
         |    "collections": [$colls], "bson_dir": "/unused"}},
         |  "target": {"target_type": "jdbc", "jdbc": {
         |    "url": "jdbc:x", "database": "APP", "table": "shared",
         |    "dialect": "ansi"}}
         |}""".stripMargin)

    val multi = cfg("""{"table_name": "users"}, {"table_name": "orders"}""")
    val mcMulti = multi.source.mongodb.get
    assert(mcMulti.collections.map(c =>
      Main.mongoTargetJdbc(multi, mcMulti, c)._1.table) == Seq("users", "orders"))

    // single collection keeps the configured table name (back-compat:
    // that's the one table the user pointed the pipe at)
    val single = cfg("""{"table_name": "users"}""")
    val mcSingle = single.source.mongodb.get
    assert(Main.mongoTargetJdbc(single, mcSingle,
      mcSingle.collections.head)._1.table == "shared")

    // the clickhouse target already routes per collection
    val ch = PipeConfig.fromJson(
      """{
        |  "source": {"source_type": "mongodb", "mongodb": {
        |    "connection": {"host": "unused", "port": 0, "database": "app"},
        |    "collections": [{"table_name": "users"}, {"table_name": "orders"}],
        |    "bson_dir": "/unused"}},
        |  "target": {"target_type": "clickhouse", "clickhouse": {
        |    "connection": {"host": "h", "port": 8123, "database": "an"}}}
        |}""".stripMargin)
    val mcCh = ch.source.mongodb.get
    assert(mcCh.collections.map(c =>
      Main.mongoTargetJdbc(ch, mcCh, c)._1.table) == Seq("users", "orders"))
  }

  test("live jdbc config runs the full pipe end-to-end against embedded Derby") {
    import graft.live.{JdbcClient, JdbcConnInfo}
    val url = "jdbc:derby:memory:maindb;create=true"
    val c = new JdbcClient(JdbcConnInfo(url))
    val out = Files.createTempDirectory("graft-main-jdbc").toString
    try {
      c.execute("CREATE TABLE snap (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      c.execute("INSERT INTO snap VALUES (1, 'a'), (2, 'b')")
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      c.execute("INSERT INTO changelog VALUES (1, 'I', 10, 'x'), (2, 'D', 1, NULL)")
      c.execute("CREATE TABLE target (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")

      val cfg = PipeConfig.fromJson(
        s"""{
           |  "source": {"source_type": "jdbc", "jdbc": {
           |    "url": "$url", "changelog_table": "changelog",
           |    "snapshot_table": "snap", "offset_path": "$out/pipe.offset"}},
           |  "target": {"target_type": "jdbc", "jdbc": {
           |    "url": "$url", "database": "APP", "table": "target",
           |    "dialect": "ansi"}}
           |}""".stripMargin)
      Main.runWith(spark, cfg)

      val (_, rows) = c.query("SELECT id, v FROM target ORDER BY id")
      assert(rows.map(r => (r.get(0), r.get(1))) ==
        Vector((2L, "b"), (10L, "x")))
    } finally c.close()
  }

  test("pre-flight ping: an unreachable endpoint aborts with a clean attributed error") {
    // source down: Derby in-memory db that was never created (no ;create=true)
    val deadSrc = PipeConfig.fromJson(
      """{"source": {"source_type": "jdbc", "jdbc": {
        |   "url": "jdbc:derby:memory:neverexists", "changelog_table": "c"}},
        | "target": {"target_type": "jdbc", "jdbc": {
        |   "url": "jdbc:derby:memory:neverexists", "database": "APP",
        |   "table": "t", "dialect": "ansi"}}}""".stripMargin)
    val e1 = intercept[IllegalStateException](Main.runWith(spark, deadSrc))
    assert(e1.getMessage.contains("source ping failed"))

    // source up, target down: fails at the TARGET probe, attributed so
    import graft.live.{JdbcClient, JdbcConnInfo}
    val c = new JdbcClient(JdbcConnInfo("jdbc:derby:memory:pingsrc;create=true"))
    try {
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT)")
      val deadTgt = PipeConfig.fromJson(
        """{"source": {"source_type": "jdbc", "jdbc": {
          |   "url": "jdbc:derby:memory:pingsrc", "changelog_table": "changelog"}},
          | "target": {"target_type": "jdbc", "jdbc": {
          |   "url": "jdbc:derby:memory:neverexists", "database": "APP",
          |   "table": "t", "dialect": "ansi"}}}""".stripMargin)
      val e2 = intercept[IllegalStateException](Main.runWith(spark, deadTgt))
      assert(e2.getMessage.contains("target ping failed"))
    } finally c.close()
  }

  test("initialize phase: a missing target table is auto-created from source schema") {
    import graft.live.{JdbcClient, JdbcConnInfo}
    val url = "jdbc:derby:memory:maininit;create=true"
    val c = new JdbcClient(JdbcConnInfo(url))
    val out = Files.createTempDirectory("graft-main-init").toString
    try {
      c.execute("CREATE TABLE snap (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20))")
      c.execute("INSERT INTO snap VALUES (1, 'a')")
      c.execute("CREATE TABLE changelog (seq BIGINT NOT NULL, op VARCHAR(1) NOT NULL, id BIGINT, v VARCHAR(20))")
      c.execute("INSERT INTO changelog VALUES (1, 'I', 10, 'x')")
      // NO target table created here — the pipe's initialize makes it
      val cfg = PipeConfig.fromJson(
        s"""{
           |  "source": {"source_type": "jdbc", "jdbc": {
           |    "url": "$url", "changelog_table": "changelog",
           |    "snapshot_table": "snap", "offset_path": "$out/pipe.offset"}},
           |  "target": {"target_type": "jdbc", "jdbc": {
           |    "url": "$url", "database": "APP", "table": "target",
           |    "dialect": "ansi"}}
           |}""".stripMargin)
      Main.runWith(spark, cfg)
      val (_, rows) = c.query("SELECT id, v FROM target ORDER BY id")
      assert(rows.map(r => (r.get(0), r.get(1))) ==
        Vector((1L, "a"), (10L, "x")))
    } finally c.close()
  }
}
