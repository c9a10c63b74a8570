package graft.live

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.chstub.{ChStubClient, ChStubEngine}
import graft.config.PipeConfig
import graft.ddl.TableOptions
import graft.pgstub.{PgStubClient, PgStubEngine}
import graft.pgstub.PgStubEngine.{Col, Delete, Insert, Truncate, Update}
import graft.sinks.ClickHouseDialect
import graft.types.{CHColumn, CHType}

/** The reference's ENTIRE program executed with zero real services:
  * a Postgres source (parsed by [[PgStubEngine]]'s strict grammar,
  * emitting real pgoutput frames) driving a ClickHouse target (parsed by
  * [[ChStubEngine]]'s strict grammar) through the production pipe body
  * `Main.runPostgresWith` — the composition `src/main.rs:38-49` +
  * `src/pipes/postgres.rs:94-517` + `src/adapter/clickhouse.rs` is, and
  * the only topology a real clockpipe deployment runs.
  *
  * LivePgPipeSpec proves the SOURCE half (pgstub → Derby/parquet);
  * ClickHousePipeSpec proves the TARGET half (StatementSink → chstub);
  * this spec proves the two halves COMPOSED: initialize (publication +
  * slot + auto-CREATE TABLE with the source table comment + ADD COLUMN
  * drift), COPY first_sync with masked columns, pgoutput sync batches
  * (insert, TOASTed update, delete, truncate), a failed target write
  * replaying the same frames, the slot advancing only after every
  * table's writes committed, and a fully idempotent re-run (K6 probe,
  * no re-COPY, no re-DDL).
  */
class FullTopologySpec extends AnyFunSuite with SparkTestBase {

  private val pub = "topo_pub"

  /** Adversarial text that must survive COPY text chunking AND the
    * ClickHouse statement-literal rendering + re-parse. */
  private val hairy = "a\tb\nc\rd\\e \\N fé世界"

  private def mkPg(): PgStubEngine = {
    val e = new PgStubEngine
    e.createTable("public", "users", Seq(
      Col("id", "int8", nullable = false, pk = true),
      Col("name", "text", nullable = true, pk = false),
      Col("email", "text", nullable = true, pk = false),
      Col("bio", "text", nullable = true, pk = false)),
      comment = Some("user directory"))
    e.createTable("public", "orders", Seq(
      Col("id", "int8", nullable = false, pk = true),
      Col("total", "float8", nullable = true, pk = false)),
      comment = Some("order ledger"))
    e.seed("public", "users", Seq(
      Seq(Some("1"), Some("ada"), Some("ada@x.io"), Some(hairy)),
      Seq(Some("2"), Some("grace"), Some("g@x.io"), None)))
    e.seed("public", "orders", Seq(
      Seq(Some("10"), Some("99.5")), Seq(Some("11"), Some("1.25"))))
    // WAL history (after the seed): a user insert, a TOASTed update that
    // must keep the OLD bio (D3/D4), and an orders truncate + churn whose
    // delete lands on an already-truncated key
    e.commit(xid = 41L, Seq(
      Insert("public", "users", Seq(Some("3"), Some("lin"), Some("lin@x.io"),
        Some("new bio"))),
      Update("public", "users",
        Seq(Some("1"), Some("ada l."), Some("ada2@x.io"), Some("ignored")),
        toastCols = Set("bio"))))
    // source order: delete 10, then truncate, then inserts — at the
    // TARGET the truncate executes FIRST (K3 immediate, not queued), so
    // the queued delete of 10 lands on an already-truncated key
    e.commit(xid = 42L, Seq(
      Delete("public", "orders", Map("id" -> "10")),
      Truncate("public", "orders"),
      Insert("public", "orders", Seq(Some("12"), Some("7.5"))),
      Insert("public", "orders", Seq(Some("13"), Some("3.0")))))
    e
  }

  private def config(slot: String): PipeConfig = PipeConfig.fromJson(
    s"""{
       |  "source": {"source_type": "postgres", "postgres": {
       |    "connection": {"host": "h", "port": 5432, "database": "d"},
       |    "publication_name": "$pub", "replication_slot_name": "$slot",
       |    "use_copy_snapshot": true,
       |    "tables": [
       |      {"table_name": "orders"},
       |      {"table_name": "users", "mask_columns": ["email"]}]}},
       |  "target": {"target_type": "clickhouse", "clickhouse": {
       |    "distributed_inserts": false,
       |    "connection": {"host": "ch", "port": 8123, "database": "graft"}}}
       |}""".stripMargin)

  test("pg source -> clickhouse target: the full reference topology through Main.runPostgresWith") {
    val slot = "topo_slot1"
    val offsets = new java.io.File(s"${graft.Main.offsetsDir}/$slot.offset")
    offsets.delete()
    val pg = mkPg()
    val ch = new ChStubEngine

    // drift setup: graft.users pre-exists WITHOUT bio (created by the
    // production DDL generator so the text is the dialect's own) —
    // initialize must reconcile with exactly one ADD COLUMN
    ch.execute(ClickHouseDialect.createTableQuery("graft", "users", Seq(
      CHColumn("id", CHType.Int64, isPrimaryKey = true),
      CHColumn("name", CHType.CHNullable(CHType.CHStr)),
      CHColumn("email", CHType.CHNullable(CHType.CHStr))), TableOptions()))

    // the target transport trips ONCE on the sync-loop's orders DELETE —
    // a statement only the CDC batch emits (the snapshot is pure
    // inserts), and one that fires AFTER the same iteration already
    // truncated and re-inserted orders: the write-failure window the
    // reference replays through, mid-batch
    @volatile var tripped = false
    val clientFor: JdbcConnInfo => JdbcClient = _ => new ChStubClient(ch) {
      override def execute(sql: String): Unit = {
        if (!tripped && sql.startsWith("ALTER TABLE graft.orders DELETE")) {
          tripped = true
          throw new RuntimeException("target down")
        }
        super.execute(sql)
      }
    }

    val srcClient = new PgStubClient(pg, copyChunkSize = 3)
    val cfg = config(slot)
    try {
      graft.Main.runPostgresWith(spark, cfg, cfg.source.postgres.get, srcClient,
        JdbcConnInfo("jdbc:graft-pgstub:none"), "jdbc:postgresql://h:5432/d",
        targetClientFor = clientFor)
      assert(tripped, "the flaky write window was never exercised")

      // ---- initialize executed on BOTH endpoints ----
      assert(pg.publicationTables(pub) ==
        Set(("public", "orders"), ("public", "users")))
      assert(pg.slotExists(slot))
      // orders auto-created from introspected source schema, carrying the
      // source table's comment (reference: `src/pipes/postgres.rs:631-667`)
      val orders = ch.table("graft", "orders")
      assert(orders.engine == "ReplacingMergeTree")
      assert(orders.orderBy == Seq("id"))
      assert(orders.comment == "order ledger")
      // users drift-reconciled: exactly one ADD COLUMN, and it's bio
      val adds = ch.executed.filter(_.contains("ADD COLUMN"))
      assert(adds.size == 1 && adds.head.contains("bio"), adds.mkString("; "))
      assert(ch.table("graft", "users").columns.map(_.name) ==
        Seq("id", "name", "email", "bio"))
      val creates = ch.executed.filter(_.startsWith("CREATE TABLE"))
      assert(creates.size == 2) // the spec's pre-create + the pipe's orders

      // ---- final state under the Replacing collapse ----
      val users = ch.table("graft", "users").finalRows
        .map(r => r("id") -> r).toMap
      assert(users.keySet == Set(1, 2, 3).map(BigDecimal(_)))
      // TOASTed update kept the OLD bio, round-tripped byte-exactly
      // through 3-byte COPY chunks and the CH literal grammar
      assert(users(BigDecimal(1))("name") == "ada l.")
      assert(users(BigDecimal(1))("bio") == hairy)
      // email is MASKED on every path: snapshot and CDC rows land NULL
      assert(users.values.forall(_("email") == null))
      assert(users(BigDecimal(2))("name") == "grace")
      assert(users(BigDecimal(2))("bio") == null)
      assert(users(BigDecimal(3))("bio") == "new bio")
      // orders: truncate wiped the snapshot (10, 11), the batch's inserts
      // applied after it, the delete of 10 hit an already-truncated key
      val finalOrders = ch.table("graft", "orders").finalRows
        .map(r => (r("id"), r("total"))).toSet
      assert(finalOrders == Set(
        (BigDecimal(12), BigDecimal("7.5")), (BigDecimal(13), BigDecimal("3.0"))))

      // ---- replay semantics ----
      // the failed iteration re-peeked the SAME frames; the batch replayed
      // WHOLE: truncate ran twice (failed pass + replay), and the
      // replay's statement order is truncate -> inserts -> deletes
      val stmts = ch.executed.toVector
      assert(stmts.count(_.startsWith("TRUNCATE TABLE graft.orders")) == 2)
      val lastTrunc = stmts.lastIndexWhere(_.startsWith("TRUNCATE TABLE graft.orders"))
      val lastIns = stmts.lastIndexWhere(_.startsWith("INSERT INTO graft.orders"))
      val lastDel = stmts.lastIndexWhere(_.startsWith("ALTER TABLE graft.orders DELETE"))
      assert(lastTrunc < lastIns && lastIns < lastDel,
        s"write order: trunc@$lastTrunc ins@$lastIns del@$lastDel")

      // the slot advanced exactly once, to the last DML frame, and only
      // AFTER the re-peek (commit-after-write across ALL tables)
      assert(pg.confirmedLsn(slot) == pg.maxWalLsn - 1)
      val pgStmts = pg.statements.toVector
      assert(pgStmts.count(_.contains("pg_replication_slot_advance")) == 1)
      val advanceAt = pgStmts.indexWhere(_.contains("pg_replication_slot_advance"))
      val peeks = pgStmts.zipWithIndex
        .filter(_._1.contains("pg_logical_slot_peek_binary_changes")).map(_._2)
      assert(peeks.count(_ < advanceAt) >= 2, "failed write must re-peek before advancing")
      // COPY ran once per table
      assert(pgStmts.count(_.startsWith("COPY (")) == 2)

      // ---- idempotent re-run: K6 probe, no re-COPY, no re-DDL ----
      val pgBefore = pg.statements.size
      val chBefore = ch.executed.size
      graft.Main.runPostgresWith(spark, cfg, cfg.source.postgres.get, srcClient,
        JdbcConnInfo("jdbc:graft-pgstub:none"), "url", targetClientFor = clientFor)
      val pgAfter = pg.statements.drop(pgBefore).toVector
      assert(!pgAfter.exists(s => s.startsWith("CREATE PUBLICATION") ||
        s.startsWith("ALTER PUBLICATION") ||
        s.contains("pg_create_logical_replication_slot") ||
        s.startsWith("COPY (")))
      val chAfter = ch.executed.drop(chBefore).toVector
      assert(!chAfter.exists(s => s.startsWith("CREATE TABLE") ||
        s.contains("ADD COLUMN") || s.startsWith("INSERT") ||
        s.startsWith("TRUNCATE") || s.contains("DELETE")), chAfter.mkString("; "))
      // state unchanged
      assert(ch.table("graft", "users").finalRows.size == 3)
      assert(ch.table("graft", "orders").finalRows.size == 2)
    } finally offsets.delete()
  }
}
