package graft.mongo

import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.pipe.ResumeTokenStore
import graft.sinks.{ClickHouseDialect, StatementSink}
import graft.types.{CHColumn, CHType}
import BsonValue._

/** Per-batch Mongo schema evolution (reference:
  * `src/pipes/mongodb.rs:306-333`, `588-648`): a field that first appears
  * mid-recording is ADD-COLUMNed in the batch where its first typed value
  * arrives — BEFORE that batch's inserts — and rows synced earlier are
  * never backfilled. The fixture's `age`/`score` fields appear only from
  * event 3 of 4, with `peek_changes_limit = 2` forcing them into the
  * second batch.
  */
class MongoEvolutionSpec extends AnyFunSuite with SparkTestBase {

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

  /** 4 events; `age` (Int32) and `score` (Double) first typed at event 3. */
  private val recording: Vector[(String, Array[Byte])] = Vector(
    ("t1", ev("insert", oid(1), "t1", Some(BDoc(Vector(
      "_id" -> oid(1), "name" -> BStr("ada")))))),
    ("t2", ev("insert", oid(2), "t2", Some(BDoc(Vector(
      "_id" -> oid(2), "name" -> BStr("alan")))))),
    ("t3", ev("update", oid(2), "t3", Some(BDoc(Vector(
      "_id" -> oid(2), "name" -> BStr("alan t."), "age" -> BInt32(41),
      "score" -> BDouble(0.5)))))),
    ("t4", ev("insert", oid(3), "t4", Some(BDoc(Vector(
      "_id" -> oid(3), "name" -> BStr("grace"), "age" -> BInt32(36),
      "score" -> BDouble(0.9)))))))

  private def fetchFrom(rec: Vector[(String, Array[Byte])]):
      (Option[String], Long) => Seq[Array[Byte]] = (resume, limit) => {
    val from = resume.map(t => rec.indexWhere(_._1 == t) + 1).getOrElse(0)
    rec.slice(from, from + limit.toInt).map(_._2)
  }

  private def cfg(limit: Long) = PipeConfig(
    SourceConfig("mongodb"), TargetConfig("jdbc"),
    peek_changes_limit = Some(limit))

  test("ADD COLUMN fires in the batch where a field's first typed value arrives, before its inserts") {
    val tmp = Files.createTempDirectory("graft-mevo").toString
    val statements = ArrayBuffer.empty[String]
    val pipe = new MongoPipe(cfg(2), fetchFrom(recording),
      new ResumeTokenStore(s"$tmp/tok.json"),
      MongoInference.initialSchema,
      addColumn = c => statements +=
        ClickHouseDialect.addColumnQuery("app", "users", c),
      sinkFor = cols => new StatementSink("app", "users", cols,
        statements += _, dialect = ClickHouseDialect)(spark)
        .asBatchSink(() => false))(spark)

    assert(pipe.syncLoop(sleeper = _ => ()) == 4L)

    val adds = statements.zipWithIndex.filter(_._1.startsWith("ALTER TABLE"))
    val inserts = statements.zipWithIndex.filter(_._1.startsWith("INSERT"))
    // every field added exactly once, in first-typed order: `name` in
    // batch 1 (fresh targets start `_id`-only), age/score in batch 2
    assert(adds.map(_._1).toSeq == Seq(
      "ALTER TABLE app.users ADD COLUMN `name` Nullable(String) COMMENT '';",
      "ALTER TABLE app.users ADD COLUMN `age` Nullable(Int32) COMMENT '';",
      "ALTER TABLE app.users ADD COLUMN `score` Nullable(Float64) COMMENT '';"))
    // each batch's ADD COLUMNs precede its insert: name before batch 1's
    // (age/score-free) insert, age+score between the inserts
    assert(inserts.sizeIs == 2)
    assert(adds(0)._2 < inserts(0)._2 && inserts(0)._1.contains("(_id, name)"))
    assert(adds(1)._2 > inserts(0)._2 && adds(2)._2 < inserts(1)._2)
    assert(inserts(1)._1.contains("(_id, name, age, score)"))
    // final schema == the upfront whole-recording fold (same appearance order)
    val upfront = MongoInference.foldBatch(MongoInference.initialSchema,
      recording.map(_._2).map(ChangeStream.decode).flatMap(_.fullDocument)
        .map(_.fields.map { case (n, v) => n -> v.kind }))
    assert(pipe.schema == upfront)
  }

  test("rows synced before a field's first typed value lose it — no backfill (parquet target)") {
    val out = Files.createTempDirectory("graft-mevo-pq").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$out/bson"))
    Files.write(java.nio.file.Paths.get(s"$out/bson/users.bson"),
      recording.flatMap(_._2).toArray)

    val config = PipeConfig.fromJson(
      s"""{
         |  "source": {"source_type": "mongodb", "mongodb": {
         |    "connection": {"host": "unused", "port": 0, "database": "app"},
         |    "collections": [{"table_name": "users"}],
         |    "bson_dir": "$out/bson",
         |    "resume_token_path": "$out/token.json"}},
         |  "target": {"target_type": "parquet", "parquet_dir": "$out"},
         |  "peek_changes_limit": 2
         |}""".stripMargin)
    graft.Main.runWith(spark, config)

    val sink = new graft.pipe.ParquetStateSink(s"$out/users", Seq("_id"),
      Seq("name", "age", "score"), mergeSchema = true)(spark)
    val state = sink.read().orderBy("_id").collect()
      .map(r => (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(state == Seq(
      ("ada", None, None),              // batch 1, never saw age/score: NULLs
      ("alan t.", Some(41), Some(0.5)), // updated in batch 2: fields land
      ("grace", Some(36), Some(0.9))))
    // token committed through to the end of the recording
    assert(new ResumeTokenStore(s"$out/token.json").read().contains("t4"))
  }

  test("transient addColumn failure: schema advances per added column, replay never re-ADDs") {
    val tmp = Files.createTempDirectory("graft-mevo-retry").toString
    val adds = ArrayBuffer.empty[String]
    var failScoreOnce = true
    val pipe = new MongoPipe(cfg(2), fetchFrom(recording),
      new ResumeTokenStore(s"$tmp/tok.json"),
      MongoInference.initialSchema,
      addColumn = c => {
        // `age` lands, then `score` blips once (network): the retried
        // peek must re-propose ONLY score, never re-ADD age
        if (c.name == "score" && failScoreOnce) {
          failScoreOnce = false; sys.error("endpoint down")
        }
        adds += c.name
      },
      sinkFor = cols => new StatementSink("app", "users", cols,
        _ => (), dialect = ClickHouseDialect)(spark)
        .asBatchSink(() => false))(spark)
    assert(pipe.syncLoop(sleeper = _ => ()) == 4L)
    assert(adds.toSeq == Seq("name", "age", "score")) // each exactly once
    assert(pipe.schema.map(_.name) == Seq("_id", "name", "age", "score"))
  }

  test("a field the dialect rejects is warned and skipped permanently; the pipe stays alive") {
    val tmp = Files.createTempDirectory("graft-mevo-reject").toString
    // recording whose mid-stream doc carries an un-addressable field name
    val rec = Vector(
      ("t1", ev("insert", oid(1), "t1", Some(BDoc(Vector(
        "_id" -> oid(1), "name" -> BStr("ada")))))),
      ("t2", ev("insert", oid(2), "t2", Some(BDoc(Vector(
        "_id" -> oid(2), "name" -> BStr("alan"), "bad field" -> BInt32(1),
        "age" -> BInt32(41)))))))
    val adds = ArrayBuffer.empty[String]
    val pipe = new MongoPipe(cfg(1), fetchFrom(rec),
      new ResumeTokenStore(s"$tmp/tok.json"),
      MongoInference.initialSchema,
      addColumn = c => {
        adds += graft.sinks.AnsiDialect.addColumnQuery("app", "users", c)
      },
      sinkFor = cols => new StatementSink("app", "users", cols,
        _ => (), dialect = graft.sinks.AnsiDialect)(spark)
        .asBatchSink(() => false))(spark)
    assert(pipe.syncLoop(sleeper = _ => ()) == 2L)
    // `bad field` never became a column or a statement; age still landed
    assert(pipe.schema.map(_.name) == Seq("_id", "name", "age"))
    assert(adds.forall(!_.contains("bad field")))
  }

  test("a column the target deterministically refuses (SQLException) is rejected after the attempt cap, not replayed forever") {
    val tmp = Files.createTempDirectory("graft-mevo-sqlreject").toString
    val adds = ArrayBuffer.empty[String]
    var scoreAttempts = 0
    val pipe = new MongoPipe(cfg(2), fetchFrom(recording),
      new ResumeTokenStore(s"$tmp/tok.json"),
      MongoInference.initialSchema,
      addColumn = c => {
        // the target refuses `score` EVERY time (reserved word /
        // unsupported type): not an IllegalArgumentException, so it is
        // classified transient — the cap must still converge
        if (c.name == "score") {
          scoreAttempts += 1
          throw new java.sql.SQLException("column 'score' not allowed")
        }
        adds += c.name
      },
      sinkFor = cols => new StatementSink("app", "users", cols,
        _ => (), dialect = ClickHouseDialect)(spark)
        .asBatchSink(() => false),
      maxAddColumnAttempts = 3)(spark)
    // drains: after 3 failed attempts `score` moves to rejected and the
    // window finally routes (each failed attempt replays the window)
    assert(pipe.syncLoop(sleeper = _ => ()) == 4L)
    assert(scoreAttempts == 3)
    assert(adds.toSeq == Seq("name", "age")) // age added exactly once
    assert(pipe.schema.map(_.name) == Seq("_id", "name", "age"))
  }

  test("a pre-created full-schema target renders every field from the first batch (load_table_table_info parity)") {
    val tmp = Files.createTempDirectory("graft-mevo-pre").toString
    val statements = ArrayBuffer.empty[String]
    // running schema adopted from an existing target that already has age
    val adopted = Vector(
      CHColumn("_id", CHType.CHStr, isPrimaryKey = true),
      CHColumn("name", CHType.CHStr.nullable),
      CHColumn("age", CHType.Int32.nullable))
    val pipe = new MongoPipe(cfg(2), fetchFrom(recording),
      new ResumeTokenStore(s"$tmp/tok.json"), adopted,
      addColumn = c => statements +=
        ClickHouseDialect.addColumnQuery("app", "users", c),
      sinkFor = cols => new StatementSink("app", "users", cols,
        statements += _, dialect = ClickHouseDialect)(spark)
        .asBatchSink(() => false))(spark)
    assert(pipe.syncLoop(sleeper = _ => ()) == 4L)
    // batch 1 already renders age (NULL-valued); only score is ever added
    val inserts = statements.filter(_.startsWith("INSERT"))
    assert(inserts.head.contains("(_id, name, age)"))
    assert(statements.filter(_.startsWith("ALTER TABLE")) == Seq(
      "ALTER TABLE app.users ADD COLUMN `score` Nullable(Float64) COMMENT '';"))
  }
}
