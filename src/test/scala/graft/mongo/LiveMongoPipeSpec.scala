package graft.mongo

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.pipe.ResumeTokenStore
import graft.sinks.{ClickHouseDialect, StatementSink}
import BsonValue._

/** The live-Mongo transport seam, mirroring LivePostgresPipeSpec's
  * injected-client pattern: the production peek protocol
  * ([[LiveMongo.fetchCallback]] — open cursor at committed token, drain
  * ≤ limit, close) runs against a SCRIPTED [[LiveMongo.CursorOpener]]
  * serving real BSON change documents, and everything downstream —
  * decode, per-batch evolution, routing, token commit ordering — is the
  * production [[MongoPipe]]. Only the reflection shim against
  * mongodb-driver-sync needs the real jar; its probe/assembly behavior
  * is pinned here, and the driver-backed test self-cancels (with the
  * jar named) in this offline build.
  */
class LiveMongoPipeSpec extends AnyFunSuite with SparkTestBase {

  private def oid(i: Int) = BObjId(Vector.tabulate(12)(j => (i * 16 + j).toByte))

  private def ev(op: String, id: BsonValue, token: String, full: Option[BDoc]): Array[Byte] = {
    val f = Vector.newBuilder[(String, BsonValue)]
    f += "_id" -> BDoc(Vector("_data" -> BStr(token)))
    f += "operationType" -> BStr(op)
    f += "ns" -> BDoc(Vector("db" -> BStr("app"), "coll" -> BStr("users")))
    f += "documentKey" -> BDoc(Vector("_id" -> id))
    full.foreach(d => f += "fullDocument" -> d)
    Bson.encodeDocument(BDoc(f.result()))
  }

  private val recording: Vector[(String, Array[Byte])] = Vector(
    ("t1", ev("insert", oid(1), "t1", Some(BDoc(Vector(
      "_id" -> oid(1), "name" -> BStr("ada")))))),
    ("t2", ev("insert", oid(2), "t2", Some(BDoc(Vector(
      "_id" -> oid(2), "name" -> BStr("alan")))))),
    ("t3", ev("update", oid(1), "t3", Some(BDoc(Vector(
      "_id" -> oid(1), "name" -> BStr("ada l."), "age" -> BInt32(37)))))),
    ("t4", ev("delete", oid(2), "t4", None)))

  /** Scripted server: each open positions after the resume token and
    * serves the remaining recording; tryNext drains then reports None
    * (the live cursor's nothing-pending signal). */
  private class ScriptedOpener(rec: Vector[(String, Array[Byte])])
      extends (Option[String] => LiveMongo.ChangeCursor) {
    val opens = ArrayBuffer.empty[Option[String]]
    var openCursors = 0
    def apply(resume: Option[String]): LiveMongo.ChangeCursor = {
      opens += resume
      openCursors += 1
      var at = resume.map(t => rec.indexWhere(_._1 == t) + 1).getOrElse(0)
      new LiveMongo.ChangeCursor {
        def tryNext(): Option[Array[Byte]] =
          if (at < rec.length) { val b = rec(at)._2; at += 1; Some(b) }
          else None
        def close(): Unit = openCursors -= 1
      }
    }
  }

  test("fetchCallback: opens at the committed token, drains at most limit, closes the cursor") {
    val opener = new ScriptedOpener(recording)
    val fetch = LiveMongo.fetchCallback(opener)
    assert(fetch(None, 2L).length == 2)
    assert(fetch(Some("t2"), 10L).length == 2) // only t3, t4 remain
    assert(fetch(Some("t4"), 10L).isEmpty)     // drained stream
    assert(opener.opens.toSeq == Seq(None, Some("t2"), Some("t4")))
    assert(opener.openCursors == 0, "every peek must close its cursor")
  }

  test("full pipe over the live transport seam: state, evolution and token commits match replay") {
    val tmp = Files.createTempDirectory("graft-livemongo").toString
    val opener = new ScriptedOpener(recording)
    val statements = ArrayBuffer.empty[String]
    val cfg = PipeConfig(SourceConfig("mongodb"), TargetConfig("jdbc"),
      peek_changes_limit = Some(2))
    val tokens = new ResumeTokenStore(s"$tmp/tok.json")
    val pipe = new MongoPipe(cfg, LiveMongo.fetchCallback(opener), tokens,
      MongoInference.initialSchema,
      addColumn = c => statements +=
        ClickHouseDialect.addColumnQuery("app", "users", c),
      sinkFor = cols => new StatementSink("app", "users", cols,
        statements += _, dialect = ClickHouseDialect)(spark)
        .asBatchSink(() => false))(spark)

    assert(pipe.syncLoop(sleeper = _ => ()) == 4L)
    // per-batch evolution unchanged through the live transport
    assert(pipe.schema.map(_.name) == Seq("_id", "name", "age"))
    // token committed after the last write; cursors all closed
    assert(tokens.read().contains("t4"))
    assert(opener.openCursors == 0)
    // the second peek resumed from the FIRST batch's committed token
    assert(opener.opens.take(2) == Seq(None, Some("t2")))
  }

  test("classpath probe: no driver in this build; reflectiveTransport and Main fail with the jar hint") {
    assume(!LiveMongo.driverPresent,
      "driver jar present: probe-absent behavior not testable")
    val e = intercept[IllegalStateException](
      LiveMongo.reflectiveTransport("mongodb://h:1", "app", "users"))
    assert(e.getMessage.contains("mongodb-driver-sync"))

    // Main: live config (no bson_dir) aborts before touching any state
    val cfg = PipeConfig.fromJson(
      """{
        |  "source": {"source_type": "mongodb", "mongodb": {
        |    "connection": {"host": "h", "port": 27017, "database": "app"},
        |    "collections": [{"table_name": "users"}]}},
        |  "target": {"target_type": "parquet", "parquet_dir": "/tmp/never"}
        |}""".stripMargin)
    val e2 = intercept[IllegalStateException](graft.Main.runWith(spark, cfg))
    assert(e2.getMessage.contains("mongodb-driver-sync"))
    assert(e2.getMessage.contains("bson_dir"))
  }

  test("connection uri: reference form, escaped credentials, app_name option") {
    assert(LiveMongo.uri("h", 27017, "", "", None) == "mongodb://h:27017")
    assert(LiveMongo.uri("h", 27017, "u@x", "p w", None) ==
      "mongodb://u%40x:p+w@h:27017")
    assert(LiveMongo.uri("h", 27017, "", "", Some("graft pipe")) ==
      "mongodb://h:27017/?appName=graft+pipe")
  }

  /** Maps the driver coordinates the production glue hardcodes onto the
    * offline stub (graft.mongostub) — the ONLY substitution; every
    * getMethod/invoke below this seam is production code. Against a real
    * server the default resolver (plain Class.forName) runs the identical
    * glue over org.mongodb:mongodb-driver-sync. */
  private val stubResolve: String => Class[_] = n => Class.forName(
    n.replace("com.mongodb.client.model.changestream", "graft.mongostub.changestream")
      .replace("com.mongodb.client", "graft.mongostub.client")
      .replace("org.bson", "graft.mongostub.bson"))

  test("reflective transport executes end-to-end over the stub driver") {
    import graft.mongostub.StubServer
    StubServer.reset(recording)
    val (opener, closer) = LiveMongo.reflectiveTransport(
      LiveMongo.uri("h", 27017, "u", "p", Some("graft")), "app", "users", stubResolve)
    try {
      // client built once from the uri; watch is raw-BSON, UpdateLookup
      assert(StubServer.lastUri == "mongodb://u:p@h:27017/?appName=graft")
      assert(StubServer.lastNamespace == "app.users")

      // the full production pipe rides the reflective opener
      val tmp = Files.createTempDirectory("graft-reflmongo").toString
      val statements = ArrayBuffer.empty[String]
      val cfg = PipeConfig(SourceConfig("mongodb"), TargetConfig("jdbc"),
        peek_changes_limit = Some(2))
      val tokens = new ResumeTokenStore(s"$tmp/tok.json")
      val pipe = new MongoPipe(cfg, LiveMongo.fetchCallback(opener), tokens,
        MongoInference.initialSchema,
        addColumn = c => statements +=
          ClickHouseDialect.addColumnQuery("app", "users", c),
        sinkFor = cols => new StatementSink("app", "users", cols,
          statements += _, dialect = ClickHouseDialect)(spark)
          .asBatchSink(() => false))(spark)

      assert(pipe.syncLoop(sleeper = _ => ()) == 4L)
      // the watch carries the reference's UpdateLookup after-image /
      // raw-document / resume-token semantics (mongodb.rs:169-257).
      // Deliberate divergence: the reference watches at DATABASE level
      // with start_after; this glue watches the single configured
      // collection with resumeAfter (simpler cursor lifecycle, but a
      // collection-invalidate event would need a fresh watch rather
      // than surviving via start_after)
      assert(StubServer.lastFullDocument == "UPDATE_LOOKUP")
      assert(StubServer.watchedAs.getSimpleName == "RawBsonDocument")
      // same downstream state as the scripted-seam and replay paths:
      // bytes surviving the ByteBuf [position, limit) copy intact
      assert(pipe.schema.map(_.name) == Seq("_id", "name", "age"))
      assert(tokens.read().contains("t4"))
      // resumeAfter positioning: head, then each committed token
      assert(StubServer.opens.take(2).toSeq == Seq(None, Some("t2")))
      assert(StubServer.openCursors == 0, "every peek must close its cursor")
    } finally closer.close()
    assert(StubServer.clientsOpen == 0, "pipe exit must close the client")
  }

  test("reflective transport: jar hint when the resolver finds no driver") {
    val e = intercept[IllegalStateException](LiveMongo.reflectiveTransport(
      "mongodb://h:1", "app", "users",
      n => throw new ClassNotFoundException(n)))
    assert(e.getMessage.contains("mongodb-driver-sync"))
  }
}
