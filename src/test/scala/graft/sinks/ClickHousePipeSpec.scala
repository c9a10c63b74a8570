package graft.sinks

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.chstub.{ChStubEngine, ChStubHttp}
import graft.ddl.TableOptions
import graft.pipe.Initializer
import graft.types.{CHColumn, CHType}

/** The ClickHouse dialect EXECUTED end to end (round-8 counterpart of the
  * Mongo driver stub): initialize → first_sync → CDC batches run through
  * [[StatementSink]] against [[ChStubHttp]] — an HTTP endpoint whose
  * engine parses and applies the emitted statement text with a strict
  * subset grammar of ClickHouse's. Golden byte-compat specs pin WHAT the
  * text looks like (ClickHouseSqlSpec / DdlSpec); this pins that the
  * text actually EXECUTES: CREATE with ReplacingMergeTree + ORDER BY +
  * SETTINGS, batched INSERT, `ALTER TABLE … DELETE`, ADD COLUMN,
  * TRUNCATE, the `select exists` probe — and that the final table state
  * under ReplacingMergeTree's last-insert-wins collapse matches the CDC
  * semantics (reference: `src/adapter/mod.rs:53-255`,
  * `src/adapter/clickhouse.rs:222-265`, write order
  * `src/pipes/postgres.rs:391-485`).
  */
class ClickHousePipeSpec extends AnyFunSuite with SparkTestBase {

  private val cols = Seq(
    CHColumn("user_id", CHType.Int64, isPrimaryKey = true, comment = "the 'key'"),
    CHColumn("name", CHType.CHStr, comment = "display name"),
    CHColumn("score", CHType.CHNullable(CHType.Float64)),
    CHColumn("active", CHType.Bool),
    CHColumn("joined", CHType.CHDateTime(Some("UTC"))),
    CHColumn("birthday", CHType.CHDate),
    CHColumn("tags", CHType.CHArray(CHType.Int64)))

  private val dataSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("joined", TimestampType),
    StructField("birthday", DateType),
    StructField("tags", ArrayType(LongType))))

  private val batchSchema = StructType(
    StructField("op", StringType) +: StructField("seq", LongType) +:
      dataSchema.fields.toSeq)

  private def ts(s: String) = Timestamp.valueOf(s)
  private def day(s: String) = Date.valueOf(s)

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 2), schema)

  /** Normalize an expected Scala value into the stub's parsed form. */
  private def norm(v: Any): Any = v match {
    case null => null
    case l: Long => BigDecimal(l)
    case i: Int => BigDecimal(i)
    case d: Double => BigDecimal(d.toString)
    case t: Timestamp => t.toLocalDateTime.withNano(0)
    case d: Date => d.toLocalDate
    case s: Seq[_] => s.toVector.map(norm)
    case other => other
  }

  private def assertFinal(
      t: ChStubEngine.Table, expected: Map[Long, Seq[Any]]): Unit = {
    val got = t.finalRows.map(r => r("user_id") -> r).toMap
    assert(got.keySet == expected.keySet.map(k => BigDecimal(k)),
      s"final key set: ${got.keySet}")
    expected.foreach { case (id, vals) =>
      val row = got(BigDecimal(id))
      cols.map(_.name).zip(vals).foreach { case (c, v) =>
        assert(row(c) == norm(v), s"user $id column $c: ${row(c)} != ${norm(v)}")
      }
    }
  }

  test("initialize + first_sync + CDC batches execute end-to-end over HTTP") {
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      val dialect = ClickHouseDialect
      val engine = stub.engine

      // ---- initialize (K4): the emitted DDL must EXECUTE
      val created = Initializer.setupTable(
        () => if (engine.tableExists("graft", "users"))
          engine.table("graft", "users").columns.map(_.name).toSeq else Nil,
        stub.execute, dialect, "graft", "users", cols,
        options = TableOptions(storagePolicy = Some("tier'd")),
        tableComment = "it's the users table")
      assert(created.size == 1 && created.head.startsWith("CREATE TABLE"))
      val t = engine.table("graft", "users")
      assert(t.engine == "ReplacingMergeTree")
      assert(t.orderBy == Seq("user_id"))
      assert(t.settings("index_granularity") == "8192")
      assert(t.settings("min_age_to_force_merge_seconds") == "60")
      assert(t.settings("storage_policy") == "tier'd")
      assert(t.comment == "it's the users table")
      assert(t.column("user_id").comment == "the \"key\"") // ' → " in col comments
      assert(t.columns.map(c => c.name -> c.tpe.text) == Seq(
        "user_id" -> "Int64", "name" -> "String",
        "score" -> "Nullable(Float64)", "active" -> "Bool",
        "joined" -> "DateTime('UTC')", "birthday" -> "Date",
        "tags" -> "Array(Int64)"))

      // re-running initialize against the now-existing table is a no-op
      assert(Initializer.setupTable(
        () => engine.table("graft", "users").columns.map(_.name).toSeq,
        stub.execute, dialect, "graft", "users", cols).isEmpty)

      // ---- K6 probe before any rows
      assert(stub.post(dialect.nonEmptyProbe("graft", "users")) == "0")

      val sink = new StatementSink("graft", "users", cols, stub.execute,
        copyBatchSize = 2) // force multiple INSERT statements
      // ---- first_sync (EP2): snapshot bulk insert, with hostile strings
      val snapshot = df(dataSchema,
        Row(1L, "ali'ce \\ \n\r\t? \u0000end", 9.5, true,
          ts("2024-01-01 10:00:00"), day("1990-05-01"), Seq(1L, 2L)),
        Row(2L, "bob", null, false,
          ts("2024-01-02 11:30:00"), day("1985-12-31"), Seq.empty[Long]),
        Row(3L, "carol", 7.25, true,
          ts("2024-02-03 23:59:59"), day("2000-02-29"), Seq(3L)))
      assert(sink.bulkInsert(snapshot) == 3L)
      assert(stub.post(dialect.nonEmptyProbe("graft", "users")) == "1")
      // copyBatchSize = 2 over 2 slices → one INSERT per partition chunk
      assert(engine.executed.count(_.startsWith("INSERT INTO")) >= 2)
      assertFinal(t, Map(
        1L -> Seq(1L, "ali'ce \\ \n\r\t? \u0000end", 9.5, true,
          ts("2024-01-01 10:00:00"), day("1990-05-01"), Seq(1L, 2L)),
        2L -> Seq(2L, "bob", null, false,
          ts("2024-01-02 11:30:00"), day("1985-12-31"), Seq.empty),
        3L -> Seq(3L, "carol", 7.25, true,
          ts("2024-02-03 23:59:59"), day("2000-02-29"), Seq(3L))))

      // ---- CDC batch (EP3): upserts (deduped last-wins), then deletes
      val batch1 = df(batchSchema,
        Row("U", 10L, 1L, "alice v1", 1.0, true,
          ts("2024-03-01 00:00:00"), day("1990-05-01"), Seq(1L)),
        Row("U", 12L, 1L, "alice v2", 2.0, false,
          ts("2024-03-02 00:00:00"), day("1990-05-01"), Seq(1L, 9L)),
        Row("I", 11L, 4L, "dave", null, true,
          ts("2024-03-03 08:00:00"), day("1999-09-09"), Seq.empty[Long]),
        Row("D", 13L, 2L, null, null, null, null, null, null))
      val (ins, del, trunc) = sink.applyBatch(batch1)
      assert((ins, del, trunc) == (2L, 1L, false))
      // write order: the DELETE mutation lands after the batch's inserts
      val stmts = engine.executed.toSeq
      val lastInsert = stmts.lastIndexWhere(_.startsWith("INSERT INTO"))
      val delIdx = stmts.indexWhere(_.startsWith("ALTER TABLE graft.users DELETE"))
      assert(delIdx > lastInsert)
      assertFinal(t, Map(
        1L -> Seq(1L, "alice v2", 2.0, false,
          ts("2024-03-02 00:00:00"), day("1990-05-01"), Seq(1L, 9L)),
        3L -> Seq(3L, "carol", 7.25, true,
          ts("2024-02-03 23:59:59"), day("2000-02-29"), Seq(3L)),
        4L -> Seq(4L, "dave", null, true,
          ts("2024-03-03 08:00:00"), day("1999-09-09"), Seq.empty)))

      // ---- truncate batch through the routed-pipe seam (K3 first, then
      // the batch's inserts), driven via asBatchSink as Main wires it
      val routed = sink.asBatchSink(() =>
        SqlDialect.truthy(stub.post(dialect.nonEmptyProbe("graft", "users"))))
      assert(!routed.isEmpty)
      val batch2 = df(batchSchema,
        Row("T", 20L, 0L, null, null, null, null, null, null),
        Row("I", 21L, 7L, "eve", 0.5, true,
          ts("2024-04-01 12:00:00"), day("2001-01-01"), Seq(7L)))
      routed.appendBatch(batch2, batchId = 21L)
      assertFinal(t, Map(
        7L -> Seq(7L, "eve", 0.5, true,
          ts("2024-04-01 12:00:00"), day("2001-01-01"), Seq(7L))))

      // ---- schema drift (K5): ADD COLUMN executes, widened inserts land
      val widened = cols :+ CHColumn("country", CHType.CHNullable(CHType.CHStr))
      val drift = Initializer.setupTable(
        () => engine.table("graft", "users").columns.map(_.name).toSeq,
        stub.execute, dialect, "graft", "users", widened)
      assert(drift == Seq(dialect.addColumnQuery("graft", "users",
        CHColumn("country", CHType.CHNullable(CHType.CHStr)))))
      assert(t.column("country").tpe.text == "Nullable(String)")
      val wideSink = new StatementSink("graft", "users", widened, stub.execute)
      val batch3 = df(
        StructType(batchSchema.fields.toSeq :+ StructField("country", StringType)),
        Row("U", 30L, 7L, "eve", 0.5, true,
          ts("2024-04-01 12:00:00"), day("2001-01-01"), Seq(7L), "nz"))
      wideSink.applyBatch(batch3)
      assert(t.finalRows.map(r => r("user_id") -> r("country")).toMap ==
        Map(BigDecimal(7) -> "nz"))
    } finally stub.close()
  }

  test("masked columns render as type defaults and execute") {
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      stub.execute(ClickHouseDialect.createTableQuery("graft", "m", cols))
      val sink = new StatementSink("graft", "m", cols, stub.execute,
        maskColumns = Set("name", "score"))
      sink.bulkInsert(df(dataSchema,
        Row(1L, "secret", 3.5, true,
          ts("2024-01-01 00:00:00"), day("2020-01-01"), Seq(1L))))
      val row = stub.engine.table("graft", "m").finalRows.head
      assert(row("name") == "")        // masked non-nullable String → ''
      assert(row("score") == null)     // masked Nullable → NULL
      assert(row("active") == true)    // unmasked survives
    } finally stub.close()
  }

  test("a statement the endpoint rejects surfaces as a sink failure (HTTP 400)") {
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      stub.execute(ClickHouseDialect.createTableQuery("graft", "users", cols))
      // unknown column
      val e1 = intercept[IllegalStateException] {
        stub.execute("INSERT INTO graft.users (nope) VALUES(1)")
      }
      assert(e1.getMessage.contains("unknown column 'nope'"))
      // K7: a `?` in rendered text must arrive UN-doubled — the sink
      // correctly does not apply the reference client's ?→?? quirk
      // (`ClickHouseSql` K7 note). The quirk applied here would store
      // corrupt content ("a??b"), which the final-state check catches.
      val qrow = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](1L, "a?b", null, true, ts("2024-01-01 00:00:00"),
          day("2024-01-01"), Seq.empty[Long]),
        dataSchema)
      stub.execute(ClickHouseSql.insertQuery("graft", "users", cols, Seq(qrow)))
      assert(stub.engine.table("graft", "users").finalRows
        .head("name") == "a?b")
      // type violation: string into Int64
      val e2 = intercept[IllegalStateException] {
        stub.execute("INSERT INTO graft.users (user_id, name, score, active, " +
          "joined, birthday, tags) VALUES('x','a',NULL,TRUE," +
          "toDateTime('2024-01-01 00:00:00'),toDate('2024-01-01'),[])")
      }
      assert(e2.getMessage.contains("string literal into Int64"))
      // malformed statement text is rejected wholesale
      intercept[IllegalStateException] {
        stub.execute("TRUNCATE TABLE graft.users extra_tokens_here")
      }
    } finally stub.close()
  }

  test("routed multi-table pipe executes against two stub tables (Main's live wiring)") {
    import spark.implicits._
    import graft.config.{PipeConfig, SourceConfig, TargetConfig}
    import graft.pipe.{ChangelogReplaySource, FileOffsetStore, Initializer => Init, MultiTablePipe, TableSpec}
    val stub = new ChStubHttp(new ChStubEngine)
    try {
      val dialect = ClickHouseDialect
      val tmp = java.nio.file.Files.createTempDirectory("graft-ch-multi").toString
      val tcols = Seq(
        CHColumn("id", CHType.Int64, isPrimaryKey = true),
        CHColumn("v", CHType.CHNullable(CHType.Float64)),
        CHColumn("secret", CHType.CHNullable(CHType.CHStr)))
      // per routed table: initialize (K4) + StatementSink + probe —
      // exactly Main.targetBatchSink's jdbc/clickhouse branch
      def mkSink(table: String, mask: Set[String]) = {
        Init.setupTable(
          () => if (stub.engine.tableExists("graft", table))
            stub.engine.table("graft", table).columns.map(_.name).toSeq else Nil,
          stub.execute, dialect, "graft", table, tcols)
        new StatementSink("graft", table, tcols, stub.execute, mask)
          .asBatchSink(() => SqlDialect.truthy(
            stub.post(dialect.nonEmptyProbe("graft", table))))
      }
      val tables = Map(
        "users" -> TableSpec(tcols, mkSink("users", Set("secret")), Set("secret")),
        "orders" -> TableSpec(tcols, mkSink("orders", Set.empty)))

      val changelog = Seq(
        ("I", 1L, "users", 1L, 10.0, "a"),
        ("I", 2L, "orders", 1L, 5.0, "b"),
        ("U", 3L, "users", 1L, 20.0, "c"),
        ("D", 4L, "orders", 1L, 0.0, null),
        ("I", 5L, "ghosts", 9L, 9.9, "x"), // unknown table: warn + skip
        ("I", 6L, "orders", 2L, 7.0, "d")
      ).toDF("op", "seq", "table", "id", "v", "secret")

      val pipe = new MultiTablePipe(
        PipeConfig(SourceConfig("parquet"), TargetConfig("parquet"),
          peek_changes_limit = Some(3L)),
        new ChangelogReplaySource(changelog),
        tables, new FileOffsetStore(s"$tmp/offset"))
      assert(pipe.syncLoop() == 6L)

      // final states under the Replacing collapse, every statement
      // having EXECUTED through the endpoint
      val users = stub.engine.table("graft", "users").finalRows
        .map(r => r("id") -> (r("v"), r("secret"))).toMap
      assert(users == Map(BigDecimal(1) -> ((BigDecimal("20.0"), null))))
      val orders = stub.engine.table("graft", "orders").finalRows
        .map(r => r("id") -> r("v")).toMap
      assert(orders == Map(BigDecimal(2) -> BigDecimal("7.0")))
      // both targets created + populated over the wire: per-table DDL,
      // INSERTs for both, one DELETE mutation for orders
      val stmts = stub.engine.executed.toSeq
      assert(stmts.count(_.startsWith("CREATE TABLE")) == 2)
      assert(stmts.exists(_.startsWith("ALTER TABLE graft.orders DELETE")))
    } finally stub.close()
  }

  test("ReplacingMergeTree collapse: re-inserted keys keep the last insert") {
    val engine = new ChStubEngine
    engine.execute(ClickHouseDialect.createTableQuery("graft", "r",
      Seq(CHColumn("k", CHType.Int64, isPrimaryKey = true),
        CHColumn("v", CHType.CHStr))))
    engine.execute("INSERT INTO graft.r (k, v) VALUES(1,'first'), (2,'x')")
    engine.execute("INSERT INTO graft.r (k, v) VALUES(1,'second')")
    val fin = engine.table("graft", "r").finalRows
      .map(r => r("k") -> r("v")).toMap
    assert(fin == Map(BigDecimal(1) -> "second", BigDecimal(2) -> "x"))
    // raw parts retain history (3 rows) — collapse is a READ semantic
    assert(engine.table("graft", "r").rows.size == 3)
  }
}
