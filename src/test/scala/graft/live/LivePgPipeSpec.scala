package graft.live

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.PipeConfig
import graft.pgstub.{PgStubClient, PgStubEngine}
import graft.pgstub.PgStubEngine.{Col, Delete, Insert, Truncate, Update}
import graft.sources.CatalogSql

/** The live-Postgres surface EXECUTED, not golden-compared — the pgstub
  * twin of ClickHousePipeSpec (r8) and LiveMongoPipeSpec (r7): every
  * statement the pipe emits (publication/slot DDL, the
  * `information_schema` introspection joins, `pg_logical_slot_peek_binary_
  * changes`, `pg_replication_slot_advance`, `COPY … TO STDOUT`) is parsed
  * by [[PgStubEngine]]'s strict grammar and applied against an in-memory
  * catalog + WAL whose frames come from the repo's own pgoutput encoder.
  * The target is REAL embedded Derby; everything between source and
  * target is production code (`Main.runPostgresWith`).
  */
class LivePgPipeSpec extends AnyFunSuite with SparkTestBase {

  private val pub = "pgstub_pub"

  /** Adversarial text the COPY path must round-trip byte-exactly through
    * 3-byte chunks: tab, newline, CR, backslash, a `\N`-lookalike, and
    * multi-byte UTF-8 that the chunking slices mid-sequence. */
  private val hairy = "a\tb\nc\rd\\e \\N fé世界"

  private def mkEngine(): PgStubEngine = {
    val e = new PgStubEngine
    e.createTable("public", "users", Seq(
      Col("id", "int8", nullable = false, pk = true),
      Col("name", "text", nullable = true, pk = false, comment = "display name"),
      Col("bio", "text", nullable = true, pk = false)),
      comment = Some("user directory"), reltuples = 1000.0)
    e.createTable("public", "orders", Seq(
      Col("id", "int8", nullable = false, pk = true),
      Col("total", "float8", nullable = true, pk = false)))
    e.seed("public", "users", Seq(
      Seq(Some("1"), Some("ada"), Some(hairy)),
      Seq(Some("2"), Some("grace"), None)))
    e.seed("public", "orders", Seq(Seq(Some("10"), Some("99.5"))))
    e
  }

  private def config(slot: String, derbyUrl: String): PipeConfig =
    PipeConfig.fromJson(
      s"""{
         |  "source": {"source_type": "postgres", "postgres": {
         |    "connection": {"host": "h", "port": 5432, "database": "d"},
         |    "publication_name": "$pub", "replication_slot_name": "$slot",
         |    "use_copy_snapshot": true,
         |    "tables": [
         |      {"table_name": "orders"},
         |      {"table_name": "users"}]}},
         |  "target": {"target_type": "jdbc", "jdbc": {
         |    "url": "$derbyUrl", "database": "APP", "table": "unused",
         |    "dialect": "ansi"}}
         |}""".stripMargin)

  test("full lifecycle executed: COPY snapshot, pgoutput CDC, slot advance — all through the parsed stub") {
    val slot = "pgstub_slot1"
    val derbyUrl = "jdbc:derby:memory:pgstub1;create=true"
    val derby = new JdbcClient(JdbcConnInfo(derbyUrl))
    val offsets = new java.io.File(s"${graft.Main.offsetsDir}/$slot.offset")
    try {
      val engine = mkEngine()
      // committed AFTER the seed (slot history starts here): an insert, a
      // TOASTed update (bio unchanged → 'u' + old tuple, D3/D4 for real),
      // an order insert and a delete
      engine.commit(xid = 41L, Seq(
        Insert("public", "users", Seq(Some("3"), Some("lin"), Some("new bio"))),
        Update("public", "users", Seq(Some("1"), Some("ada l."), Some("ignored")),
          toastCols = Set("bio"))))
      engine.commit(xid = 42L, Seq(
        Insert("public", "orders", Seq(Some("11"), Some("12.25"))),
        Delete("public", "orders", Map("id" -> "10"))))

      val client = new PgStubClient(engine, copyChunkSize = 3)
      val cfg = config(slot, derbyUrl)
      graft.Main.runPostgresWith(spark, cfg, cfg.source.postgres.get, client,
        JdbcConnInfo(derbyUrl), "jdbc:postgresql://h:5432/d")

      // initialize: publication over BOTH tables + slot — actually parsed
      // and applied, visible in catalog state
      assert(engine.publicationTables(pub) ==
        Set(("public", "orders"), ("public", "users")))
      assert(engine.slotExists(slot))

      // COPY snapshot + CDC landed: hairy text round-tripped through
      // 3-byte chunks; the TOASTed update kept the OLD bio (resolved from
      // the 'O' tuple, not nulled); insert/delete applied
      val users = derby.query(
        "SELECT id, name, bio FROM APP.users ORDER BY id")._2
      assert(users.map(r => (r.get(0), r.get(1), r.get(2))) == Vector(
        (1L, "ada l.", hairy),
        (2L, "grace", null),
        (3L, "lin", "new bio")))
      val orders = derby.query("SELECT id, total FROM APP.orders ORDER BY id")._2
      assert(orders.map(r => (r.get(0), r.get(1))) == Vector((11L, 12.25)))

      // the slot advanced exactly to the last DML frame, AFTER the writes
      val dmlMax = engine.maxWalLsn - 1 // trailing Commit frame stays pending
      assert(engine.confirmedLsn(slot) == dmlMax)
      val stmts = engine.statements.toVector
      val advanceAt = stmts.lastIndexWhere(_.contains("pg_replication_slot_advance"))
      val peekAt = stmts.indexWhere(_.contains("pg_logical_slot_peek_binary_changes"))
      assert(peekAt >= 0 && advanceAt > peekAt)
      // the COPY statements were parsed and served (one per table)
      assert(stmts.count(_.startsWith("COPY (")) == 2)

      // ---- re-run: everything exists → no DDL re-issued, no re-COPY ----
      val before = engine.statements.size
      val copiesBefore = stmts.count(_.startsWith("COPY ("))
      graft.Main.runPostgresWith(spark, cfg, cfg.source.postgres.get, client,
        JdbcConnInfo(derbyUrl), "url")
      val after = engine.statements.drop(before).toVector
      assert(!after.exists(s => s.startsWith("CREATE PUBLICATION") ||
        s.startsWith("ALTER PUBLICATION") ||
        s.contains("pg_create_logical_replication_slot")))
      // K6 + lazy snapshots: the non-empty Derby targets mean the COPY
      // stream is never pulled again
      assert(engine.statements.count(_.startsWith("COPY (")) == copiesBefore)
      // state unchanged
      assert(derby.queryScalar("SELECT COUNT(*) FROM APP.users")
        .map(_.toString.toLong).contains(3L))
    } finally {
      derby.close()
      offsets.delete()
    }
  }

  test("snapshot↔CDC handoff: writes committed MID-COPY land exactly once") {
    // the reference's create-slot-BEFORE-COPY contract (its pipe
    // initializes the slot, then snapshots, so writes concurrent with
    // the snapshot replay through CDC): here the concurrent commit
    // lands between slot creation and the COPY reads, so the snapshot
    // ALREADY CONTAINS the new/updated rows AND the WAL replays the
    // same changes — the adversarial overlap. Exactly-once final state
    // requires the upsert collapse (duplicate insert), update
    // idempotence, and a harmless delete-of-absent-row.
    val slot = "pgstub_slot_handoff"
    val derbyUrl = "jdbc:derby:memory:pgstubh;create=true"
    val derby = new JdbcClient(JdbcConnInfo(derbyUrl))
    val offsets = new java.io.File(s"${graft.Main.offsetsDir}/$slot.offset")
    try {
      val engine = mkEngine()
      var injected = false
      val client = new PgStubClient(engine, copyChunkSize = 3,
        beforeCopy = () => if (!injected) { // before the FIRST table's chunks
          injected = true
          engine.commit(xid = 77L, Seq(
            Insert("public", "users", Seq(Some("4"), Some("eve"), Some("mid-copy"))),
            Update("public", "users", Seq(Some("1"), Some("ada2"), Some("b2"))),
            Delete("public", "users", Map("id" -> "2"))))
          engine.commit(xid = 78L, Seq(
            Insert("public", "orders", Seq(Some("12"), Some("5.5")))))
        })
      val cfg = config(slot, derbyUrl)
      graft.Main.runPostgresWith(spark, cfg, cfg.source.postgres.get, client,
        JdbcConnInfo(derbyUrl), "jdbc:postgresql://h:5432/d")
      assert(injected, "the COPY path must have been exercised")
      // final-state parity with the stub's CURRENT tables: snapshot +
      // replay collapsed exactly once, the deleted row gone, nothing
      // duplicated
      val users = derby.query(
        "SELECT id, name, bio FROM APP.users ORDER BY id")._2
      assert(users.map(r => (r.get(0), r.get(1), r.get(2))) == Vector(
        (1L, "ada2", "b2"),
        (4L, "eve", "mid-copy")))
      val orders = derby.query("SELECT id, total FROM APP.orders ORDER BY id")._2
      assert(orders.map(r => (r.get(0), r.get(1))) == Vector(
        (10L, 99.5), (12L, 5.5)))
      // the overlap frames were really REPLAYED (not skipped): the slot
      // advanced past the injected transactions' DML
      assert(engine.confirmedLsn(slot) == engine.maxWalLsn - 1)
    } finally {
      derby.close()
      offsets.delete()
    }
  }

  test("a failed write re-peeks the SAME frames; the slot advances only after the write commits") {
    val slot = "pgstub_slot2"
    val engine = mkEngine()
    engine.execute(CatalogSql.pgCreatePublication(pub, Seq("public.users")))
    engine.execute(CatalogSql.pgCreateSlot(slot))
    engine.commit(7L, Seq(
      Insert("public", "users", Seq(Some("5"), Some("eve"), None)),
      Insert("public", "users", Seq(Some("6"), Some("mal"), None))))

    val client = new PgStubClient(engine)
    val rel = PgRelation(engine.table("public", "users").oid, "users",
      Seq("id", "name", "bio"))
    val source = new PgOutputJdbcSource(client, slot, pub, Seq(rel),
      () => spark.emptyDataFrame)

    // a sink that rejects its first append — the write-failure window
    val applied = ArrayBuffer.empty[Seq[Any]]
    var failures = 0
    val flaky = new graft.pipe.BatchSink {
      def isEmpty: Boolean = applied.isEmpty
      def appendBatch(batch: DataFrame, batchId: Long): Unit = {
        if (failures == 0) { failures += 1; throw new RuntimeException("target down") }
        applied ++= batch.collect().map(_.toSeq)
      }
    }
    val tmp = java.nio.file.Files.createTempDirectory("pgstub-offsets")
    val offsets = new graft.pipe.FileOffsetStore(s"$tmp/o.offset") {
      override def write(offset: Long): Unit = {
        super.write(offset); source.advance(offset)
      }
    }
    val cfg = config(slot, "jdbc:derby:memory:pgstub-unused;create=true")
    val routed = new graft.pipe.CdcSource {
      def snapshot() = spark.emptyDataFrame
      def peekChanges(after: Long, limit: Long) =
        PgOutputJdbcSource.multiTableSlices(
          source.peekChanges(after, limit), Seq(rel))
    }
    val pipe = new graft.pipe.MultiTablePipe(cfg, routed,
      Map("users" -> graft.pipe.TableSpec(Seq(
        graft.types.CHColumn("id", graft.types.CHType.Int64, isPrimaryKey = true),
        graft.types.CHColumn("name",
          graft.types.CHType.CHNullable(graft.types.CHType.CHStr)),
        graft.types.CHColumn("bio",
          graft.types.CHType.CHNullable(graft.types.CHType.CHStr))),
        flaky)), offsets)

    val peeksBefore = engine.peeksServed
    pipe.syncLoop(maxIterations = 10)
    // iteration 1 peeked and FAILED the write: slot untouched, nothing
    // applied; iteration 2 re-peeked the SAME frames (the stub is
    // non-consuming until advance) and applied them; iteration 3 drained
    assert(failures == 1)
    assert(engine.peeksServed >= peeksBefore + 3)
    // aligned batch shape: (op, seq, id, name, bio) — decoded values are
    // text at this stage (the sink owns the target-type cast)
    assert(applied.map(r => (r(2), r(3))).toSet == Set(("5", "eve"), ("6", "mal")))
    assert(engine.confirmedLsn(slot) > 0)
    val stmts = engine.statements.toVector
    val advances = stmts.count(_.contains("pg_replication_slot_advance"))
    assert(advances == 1, s"exactly one advance, got $advances")
    // ordering: the single advance comes AFTER the second peek
    val peekIdxs = stmts.zipWithIndex
      .filter(_._1.contains("pg_logical_slot_peek_binary_changes")).map(_._2)
    val advanceIdx = stmts.indexWhere(_.contains("pg_replication_slot_advance"))
    assert(peekIdxs.count(_ < advanceIdx) >= 2)
  }

  test("introspection SQL is EVALUATED against the catalog, not pattern-matched") {
    val engine = mkEngine()
    // composite-PK table: the EXISTS(table_constraints ⋈ key_column_usage)
    // subquery must flag BOTH key parts and nothing else
    engine.createTable("public", "events", Seq(
      Col("tenant", "int8", nullable = false, pk = true),
      Col("seq", "int8", nullable = false, pk = true),
      Col("payload", "text", nullable = true, pk = false)))
    val client = new PgStubClient(engine)

    val cols = client.query(CatalogSql.pgColumns("public", "events"))._2
    assert(cols.map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
      r.getBoolean(4))) == Vector(
      ("tenant", "int8", false, true),
      ("seq", "int8", false, true),
      ("payload", "text", true, false)))

    // column + table comments flow through pg_description/obj_description
    val userCols = client.query(CatalogSql.pgColumns("public", "users"))._2
    assert(userCols.map(r => (r.getString(0), r.getString(5))) == Vector(
      ("id", ""), ("name", "display name"), ("bio", "")))
    assert(client.queryScalar(CatalogSql.pgTableComment("public", "users"))
      .contains("user directory"))
    assert(client.queryScalar(CatalogSql.pgTableComment("public", "orders"))
      .contains("")) // COALESCE covers the no-comment table

    // reltuples is the PLANNER ESTIMATE, not a live count: users holds 2
    // rows but advertises 1000
    assert(client.queryScalar(CatalogSql.pgRowEstimate("public", "users"))
      .map(_.toString.toLong).contains(1000L))

    // relation-id join resolves oids through pg_class ⋈ pg_namespace
    val rels = client.query(
      CatalogSql.pgRelationIds("public", Seq("users", "orders")))._2
    assert(rels.map(_.getString(2)).toSet == Set("users", "orders"))
    assert(rels.map(_.get(0).toString.toLong).toSet ==
      Set(engine.table("public", "users").oid,
        engine.table("public", "orders").oid))
  }

  test("strictness: malformed emissions and protocol violations fail like the real server") {
    val engine = mkEngine()
    val slot = "pgstub_slot3"
    engine.execute(CatalogSql.pgCreatePublication(pub, Seq("public.users")))
    engine.execute(CatalogSql.pgCreateSlot(slot))

    // DDL against a missing relation refuses
    assertThrows[IllegalArgumentException] {
      engine.execute(s"CREATE PUBLICATION other FOR TABLE public.missing")
    }
    // re-adding a member refuses (the reconcile must not blind-re-add)
    assertThrows[IllegalArgumentException] {
      engine.execute(CatalogSql.pgAlterPublicationAdd(pub, Seq("public.users")))
    }
    // duplicate slot refuses
    assertThrows[IllegalArgumentException] {
      engine.execute(CatalogSql.pgCreateSlot(slot))
    }
    // peek: missing slot, missing publication, bad option, bad proto
    assertThrows[IllegalArgumentException] {
      engine.query(CatalogSql.pgPeekChanges("nope", pub, 10))
    }
    assertThrows[IllegalArgumentException] {
      engine.query(CatalogSql.pgPeekChanges(slot, "nopub", 10))
    }
    assertThrows[IllegalArgumentException] {
      engine.query(
        s"""SELECT lsn, xid, data FROM pg_logical_slot_peek_binary_changes(
           |'$slot', NULL, 10, 'proto_version', '2', 'publication_names', '$pub')
           |""".stripMargin)
    }
    assertThrows[IllegalArgumentException] {
      engine.query(
        s"""SELECT lsn, xid, data FROM pg_logical_slot_peek_binary_changes(
           |'$slot', NULL, 10, 'mystery_option', '1')
           |""".stripMargin)
    }
    // advance: non-monotone and beyond-WAL refuse
    engine.commit(1L, Seq(Insert("public", "users",
      Seq(Some("7"), Some("g"), None))))
    engine.execute(CatalogSql.pgAdvanceSlot(slot, PgLsn.fromLong(2L)))
    assertThrows[IllegalArgumentException] {
      engine.execute(CatalogSql.pgAdvanceSlot(slot, PgLsn.fromLong(1L)))
    }
    assertThrows[IllegalArgumentException] {
      engine.execute(CatalogSql.pgAdvanceSlot(slot, PgLsn.fromLong(9999L)))
    }
    // unterminated string / stray tokens are syntax errors
    assertThrows[IllegalArgumentException] {
      engine.query("SELECT pubname FROM pg_publication WHERE pubname = 'x")
    }
    assertThrows[IllegalArgumentException] {
      engine.query(CatalogSql.pgFindSlot(slot) + " EXTRA JUNK")
    }
  }

  test("peek is publication-filtered: frames of unpublished tables never leave the slot") {
    val engine = mkEngine()
    val slot = "pgstub_slot4"
    // publication covers users only; orders traffic must not appear
    engine.execute(CatalogSql.pgCreatePublication(pub, Seq("public.users")))
    engine.execute(CatalogSql.pgCreateSlot(slot))
    engine.commit(9L, Seq(
      Insert("public", "orders", Seq(Some("20"), Some("1.5"))),
      Insert("public", "users", Seq(Some("8"), Some("hop"), None)),
      Truncate("public", "orders")))
    val (_, rows) = engine.query(CatalogSql.pgPeekChanges(slot, pub, 100))
    val frames = rows.map(_(2).asInstanceOf[Array[Byte]])
    val decoded = frames.flatMap(graft.decode.PgOutputDecoder.decode)
    // exactly one DML survives — the users insert; the Begin/Commit
    // markers pass through and decode to None
    assert(decoded.map(m => (m.messageType, m.relationId)) ==
      Seq(('I', engine.table("public", "users").oid)))
    // limit is honored and the peek does not consume
    val (_, limited) = engine.query(CatalogSql.pgPeekChanges(slot, pub, 2))
    assert(limited.size == 2)
    assert(engine.query(CatalogSql.pgPeekChanges(slot, pub, 100))._2.size
      == rows.size)
  }
}
