package graft.live

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.chstub.{ChStubClient, ChStubEngine}
import graft.config.PipeConfig
import graft.mongo.{Bson, BsonValue}
import graft.mongo.BsonValue._
import graft.mongostub.StubServer

/** The reference's SECOND program shape executed with zero real
  * services: a MongoDB change-stream source (the offline stub driver
  * behind the production reflective glue — collection `watch`,
  * UpdateLookup after-images, `resumeAfter` positioning) driving a
  * ClickHouse target (parsed by [[ChStubEngine]]'s strict grammar)
  * through the production pipe body `Main.runMongoWith` — the
  * composition `src/main.rs:38-49` + `src/pipes/mongodb.rs:264-345`
  * (initialize `:532-585`, per-batch evolution `:588-648`) +
  * `src/adapter/clickhouse.rs`.
  *
  * LiveMongoPipeSpec proves the SOURCE half (stub driver → statement
  * log); ClickHousePipeSpec proves the TARGET half (StatementSink →
  * chstub); [[FullTopologySpec]] proves the PG composition. This spec
  * closes the matrix: initialize (`_id`-only auto-CREATE + schema
  * adoption), per-batch ADD COLUMN evolution executed by the target
  * grammar, masked columns, UpdateLookup upserts, key-only deletes, a
  * failed target write replaying the SAME change-stream window from the
  * committed resume token, token-after-write commit ordering,
  * cursor/client lifecycle, and a fully idempotent re-run.
  */
class MongoFullTopologySpec extends AnyFunSuite with SparkTestBase {

  private def oid(i: Int) = BObjId(Vector.tabulate(12)(j => (i * 16 + j).toByte))
  private def oidHex(i: Int) =
    Vector.tabulate(12)(j => f"${i * 16 + j}%02x").mkString

  /** Adversarial text that must survive BSON decode AND the ClickHouse
    * statement-literal rendering + re-parse. */
  private val hairy = "ada\tl. 'q' \\N fé世界"

  private def ev(op: String, id: BsonValue, token: String,
      full: Option[BDoc]): Array[Byte] = {
    val f = Vector.newBuilder[(String, BsonValue)]
    f += "_id" -> BDoc(Vector("_data" -> BStr(token)))
    f += "operationType" -> BStr(op)
    f += "ns" -> BDoc(Vector("db" -> BStr("app"), "coll" -> BStr("users")))
    f += "documentKey" -> BDoc(Vector("_id" -> id))
    full.foreach(d => f += "fullDocument" -> d)
    Bson.encodeDocument(BDoc(f.result()))
  }

  /** Two peek windows at limit 2: the first introduces name+email (ADD
    * COLUMN through the target grammar), the second introduces age via
    * an UpdateLookup after-image and ends on a key-only delete — the
    * statement the flaky target trips on. */
  private val recording: Vector[(String, Array[Byte])] = Vector(
    ("t1", ev("insert", oid(1), "t1", Some(BDoc(Vector(
      "_id" -> oid(1), "name" -> BStr("ada"), "email" -> BStr("ada@x.io")))))),
    ("t2", ev("insert", oid(2), "t2", Some(BDoc(Vector(
      "_id" -> oid(2), "name" -> BStr("grace"), "email" -> BStr("g@x.io")))))),
    ("t3", ev("update", oid(1), "t3", Some(BDoc(Vector(
      "_id" -> oid(1), "name" -> BStr(hairy), "email" -> BStr("a2@x.io"),
      "age" -> BInt32(37)))))),
    ("t4", ev("delete", oid(2), "t4", None)))

  /** Maps the driver coordinates the production glue hardcodes onto the
    * offline stub — the ONLY substitution (same seam as
    * LiveMongoPipeSpec); every getMethod/invoke below it is production
    * code. */
  private val stubResolve: String => Class[_] = n => Class.forName(
    n.replace("com.mongodb.client.model.changestream", "graft.mongostub.changestream")
      .replace("com.mongodb.client", "graft.mongostub.client")
      .replace("org.bson", "graft.mongostub.bson"))

  private def config(tokenPath: String): PipeConfig = PipeConfig.fromJson(
    s"""{
       |  "source": {"source_type": "mongodb", "mongodb": {
       |    "connection": {"host": "m", "port": 27017, "database": "app",
       |      "username": "u", "password": "p"},
       |    "resume_token_path": "$tokenPath",
       |    "collections": [
       |      {"table_name": "users", "mask_columns": ["email"]}]}},
       |  "target": {"target_type": "clickhouse", "clickhouse": {
       |    "distributed_inserts": false,
       |    "connection": {"host": "ch", "port": 8123, "database": "graft"}}},
       |  "peek_changes_limit": 2,
       |  "sleep_millis_when_write_failed": 0,
       |  "sleep_millis_after_sync_write": 0
       |}""".stripMargin)

  test("mongo source -> clickhouse target: the full reference topology through Main.runMongoWith") {
    val tmp = Files.createTempDirectory("graft-mongotopo").toString
    StubServer.reset(recording)
    val ch = new ChStubEngine

    // the target transport trips ONCE on the users DELETE — the last
    // statement of the second window, fired after that window's
    // evolution and upsert already succeeded: the write-failure window
    // the reference replays through from the committed resume token
    @volatile var tripped = false
    val clientFor: JdbcConnInfo => JdbcClient = _ => new ChStubClient(ch) {
      override def execute(sql: String): Unit = {
        if (!tripped && sql.startsWith("ALTER TABLE graft.users DELETE")) {
          tripped = true
          throw new RuntimeException("target down")
        }
        super.execute(sql)
      }
    }

    val cfg = config(s"$tmp/tok.json")
    graft.Main.runMongoWith(spark, cfg, driverResolve = Some(stubResolve),
      targetClientFor = clientFor, pollForever = Some(false))
    assert(tripped, "the flaky write window was never exercised")

    // ---- the production glue dialed the stub driver like a server ----
    assert(StubServer.lastUri == "mongodb://u:p@m:27017")
    assert(StubServer.lastNamespace == "app.users")
    assert(StubServer.lastFullDocument == "UPDATE_LOOKUP")

    // ---- initialize: `_id`-only auto-CREATE (mongodb.rs:532-554) ----
    val creates = ch.executed.filter(_.startsWith("CREATE TABLE"))
    assert(creates.size == 1, creates.mkString("; "))
    val users = ch.table("graft", "users")
    assert(users.engine == "ReplacingMergeTree")
    assert(users.orderBy == Seq("_id"))

    // ---- per-batch evolution EXECUTED by the target grammar ----
    // window 1 introduces name+email (even masked columns evolve — the
    // mask nulls VALUES, not schema); window 2 introduces age from the
    // UpdateLookup after-image. First-seen order, each exactly once
    // (the replayed window must not re-ADD its columns).
    val adds = ch.executed.filter(_.contains("ADD COLUMN"))
    assert(adds.size == 3, adds.mkString("; "))
    assert(users.columns.map(_.name) == Seq("_id", "name", "email", "age"))

    // ---- final state under the Replacing collapse ----
    val rows = users.finalRows.map(r => r("_id") -> r).toMap
    assert(rows.keySet == Set(oidHex(1)), s"got ${rows.keySet}")
    val ada = rows(oidHex(1))
    // UpdateLookup after-image won; hairy text round-tripped byte-exact
    // through BSON decode and the CH literal grammar
    assert(ada("name") == hairy)
    assert(ada("age") == BigDecimal(37))
    // email is MASKED: the column exists, every value lands NULL
    assert(ada("email") == null)

    // ---- replay semantics from the committed token ----
    // opens: head, then the committed t2 TWICE (failed write re-peeks
    // the same window), then the committed t4 (the drain probe)
    assert(StubServer.opens.toSeq == Seq(None, Some("t2"), Some("t2"), Some("t4")),
      StubServer.opens.mkString(", "))
    // the replayed window re-ran WHOLE: its upsert landed twice, the
    // delete twice (trip + success), and deletes stay ordered last
    val stmts = ch.executed.toVector
    assert(stmts.count(_.startsWith("ALTER TABLE graft.users DELETE")) == 1)
    // (the tripped DELETE never reached the engine; exactly one applied)
    val lastIns = stmts.lastIndexWhere(_.startsWith("INSERT INTO graft.users"))
    val lastDel = stmts.lastIndexWhere(_.startsWith("ALTER TABLE graft.users DELETE"))
    assert(lastIns < lastDel, s"write order: ins@$lastIns del@$lastDel")
    // token committed only after the write: the file holds the LAST token
    assert(new graft.pipe.ResumeTokenStore(s"$tmp/tok.json").read().contains("t4"))
    // every peek closed its cursor; pipe exit closed the client
    assert(StubServer.openCursors == 0, "every peek must close its cursor")
    assert(StubServer.clientsOpen == 0, "pipe exit must close the client")

    // ---- idempotent re-run: adoption, no re-DDL, no re-writes ----
    val chBefore = ch.executed.size
    StubServer.reset(recording) // fresh server counters, same stream
    graft.Main.runMongoWith(spark, cfg, driverResolve = Some(stubResolve),
      targetClientFor = clientFor, pollForever = Some(false))
    val chAfter = ch.executed.drop(chBefore).toVector
    assert(!chAfter.exists(s => s.startsWith("CREATE TABLE") ||
      s.contains("ADD COLUMN") || s.startsWith("INSERT") ||
      s.contains("DELETE")), chAfter.mkString("; "))
    // the re-run resumed at the committed token and found nothing pending
    assert(StubServer.opens.toSeq == Seq(Some("t4")), StubServer.opens.mkString(", "))
    assert(ch.table("graft", "users").finalRows.size == 1)
    assert(StubServer.clientsOpen == 0)
  }
}
