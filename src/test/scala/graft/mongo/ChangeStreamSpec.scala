package graft.mongo

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.config.{PipeConfig, SourceConfig, TargetConfig}
import graft.pipe.{FileOffsetStore, ParquetStateSink, Pipe, ResumeTokenStore}
import graft.types.{CHColumn, CHType}

/** Change-stream decode → changelog routing → full pipe, driven entirely
  * by encoder-built fixtures (the no-live-Mongo analogue of the
  * reference's change-stream consumption,
  * `src/adapter/mongodb.rs:169-341`, `src/pipes/mongodb.rs:294-341`). */
class ChangeStreamSpec extends AnyFunSuite with SparkTestBase {
  import BsonValue._

  private def event(
      op: String, id: BsonValue, token: String,
      full: Option[BDoc] = None, coll: String = "users"): Array[Byte] = {
    val fields = Vector.newBuilder[(String, BsonValue)]
    fields += "_id" -> BDoc(Vector("_data" -> BStr(token)))
    fields += "operationType" -> BStr(op)
    fields += "ns" -> BDoc(Vector("db" -> BStr("app"), "coll" -> BStr(coll)))
    if (op != "drop") fields += "documentKey" -> BDoc(Vector("_id" -> id))
    full.foreach(d => fields += "fullDocument" -> d)
    Bson.encodeDocument(BDoc(fields.result()))
  }

  private val oid1 = BObjId(Vector.tabulate(12)(_.toByte))

  test("decode: operationType, ns, documentKey, fullDocument, resume token") {
    val bytes = event("insert", oid1, "tok-1",
      Some(BDoc(Vector("_id" -> oid1, "name" -> BStr("ada"), "age" -> BInt32(36)))))
    val e = ChangeStream.decode(bytes)
    assert(e.opType == "insert" && e.db == "app" && e.collection == "users")
    assert(e.documentKeyId.contains(oid1))
    assert(e.resumeToken.contains("tok-1"))
    assert(e.fullDocument.get.get("name").contains(BStr("ada")))
  }

  test("routing: insert/replace/update upsert, delete key-only, drop truncates, invalidate skips") {
    val cols = Seq("_id", "name", "age")
    val ins = ChangeStream.decode(event("insert", oid1, "t1",
      Some(BDoc(Vector("_id" -> oid1, "name" -> BStr("ada"), "age" -> BInt32(36))))))
    assert(ChangeStream.toChangelogRow(ins, cols).contains(
      ("I", Seq("000102030405060708090a0b", "ada", "36"))))

    // UpdateLookup after-image present → upsert with full row
    val upd = ChangeStream.decode(event("update", oid1, "t2",
      Some(BDoc(Vector("_id" -> oid1, "name" -> BStr("ada l."), "age" -> BInt32(37))))))
    assert(ChangeStream.toChangelogRow(upd, cols).contains(
      ("U", Seq("000102030405060708090a0b", "ada l.", "37"))))

    // after-image missing (doc deleted before lookup) → warn-and-skip
    val updGone = ChangeStream.decode(event("update", oid1, "t3"))
    assert(ChangeStream.toChangelogRow(updGone, cols).isEmpty)

    // delete carries the key ONLY (D8)
    val del = ChangeStream.decode(event("delete", oid1, "t4"))
    assert(ChangeStream.toChangelogRow(del, cols).contains(
      ("D", Seq("000102030405060708090a0b", null, null))))

    val drop = ChangeStream.decode(event("drop", BNull, "t5"))
    assert(ChangeStream.toChangelogRow(drop, cols).contains(
      ("T", Seq(null, null, null))))

    val inval = ChangeStream.decode(event("invalidate", BNull, "t6"))
    assert(ChangeStream.toChangelogRow(inval, cols).isEmpty)
  }

  test("all-skip window commits its token and skips forward (no livelock)") {
    val tmp = Files.createTempDirectory("graft-cs-skip").toString
    val cols = Seq("_id", "name")
    // window 1 (limit 2) is ALL skippable: invalidate + after-image-less
    // update; window 2 carries a real insert
    val all = Seq(
      event("invalidate", BNull, "s1"),
      event("update", oid1, "s2"), // fullDocument missing → skip
      event("insert", oid1, "s3",
        Some(BDoc(Vector("_id" -> oid1, "name" -> BStr("ada"))))))
    val fetches = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val fetch: (Option[String], Long) => Seq[Array[Byte]] = (resume, limit) => {
      fetches += resume
      val from = resume.map(t => Seq("s1", "s2", "s3").indexOf(t) + 1).getOrElse(0)
      all.slice(from, from + limit.toInt)
    }
    val tokens = new graft.pipe.ResumeTokenStore(s"$tmp/token.json")
    val source = new MongoChangeStreamSource(fetch, tokens, () => cols,
      () => spark.emptyDataFrame)

    val batch = source.peekChanges(0, 2)
    // the all-skip window advanced the PERSISTED token and refetched;
    // the returned batch carries the real event
    assert(batch.count() == 1)
    assert(tokens.read().contains("s2")) // skip-window token committed
    assert(fetches.toList == List(None, Some("s2")))
    source.commitToken()
    assert(tokens.read().contains("s3"))
  }

  test("all-skip window with NO resume token fails loudly instead of spinning") {
    val tmp = Files.createTempDirectory("graft-cs-notoken").toString
    val cols = Seq("_id", "name")
    // a non-routable event whose doc lacks `_id` entirely: no token can be
    // extracted, so the cursor cannot advance past the window — refetching
    // would loop forever on the identical window
    val tokenless = Bson.encodeDocument(BDoc(Vector(
      "operationType" -> BStr("invalidate"),
      "ns" -> BDoc(Vector("db" -> BStr("app"), "coll" -> BStr("users"))))))
    var calls = 0
    val fetch: (Option[String], Long) => Seq[Array[Byte]] = (_, _) => {
      calls += 1; Seq(tokenless)
    }
    val source = new MongoChangeStreamSource(fetch,
      new graft.pipe.ResumeTokenStore(s"$tmp/token.json"), () => cols,
      () => spark.emptyDataFrame)
    val e = intercept[IllegalStateException](source.peekChanges(0, 2))
    assert(e.getMessage.contains("resume token"))
    assert(calls == 1) // failed on the first unadvanceable window, no spin
  }

  test("source + pipe: fixtures through the seam, token commits after write, replay on no-commit") {
    val tmp = Files.createTempDirectory("graft-cs").toString
    val cols = Seq("_id", "name", "age")
    def oid(i: Int) = BObjId(Vector.tabulate(12)(j => (i * 16 + j).toByte))
    def doc(i: Int, name: String, age: Int) =
      BDoc(Vector("_id" -> oid(i), "name" -> BStr(name), "age" -> BInt32(age)))

    val all = Seq(
      ("tok-1", event("insert", oid(1), "tok-1", Some(doc(1, "ada", 36)))),
      ("tok-2", event("insert", oid(2), "tok-2", Some(doc(2, "alan", 41)))),
      ("tok-3", event("update", oid(1), "tok-3", Some(doc(1, "ada l.", 37)))),
      ("tok-4", event("delete", oid(2), "tok-4")))

    // fetch resumes AFTER the stored token — the live watch contract
    val fetch: (Option[String], Long) => Seq[Array[Byte]] = (resume, limit) => {
      val from = resume.map(t => all.indexWhere(_._1 == t) + 1).getOrElse(0)
      all.slice(from, from + limit.toInt).map(_._2)
    }
    val tokens = new ResumeTokenStore(s"$tmp/token.json")
    val source = new MongoChangeStreamSource(fetch, tokens, () => cols,
      () => spark.emptyDataFrame)

    // peek is non-consuming until commitToken: same batch returns again
    val b1 = source.peekChanges(0, 2)
    assert(b1.count() == 2)
    val b1again = source.peekChanges(0, 2)
    assert(b1again.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))

    // drive the standard pipe over the seam; commit the token per batch
    // the way a live runner does (after the sink write)
    val targetCols = Seq(
      CHColumn("_id", CHType.CHStr, isPrimaryKey = true),
      CHColumn("name", CHType.CHStr.nullable),
      CHColumn("age", CHType.Int64.nullable))
    val sink = new ParquetStateSink(s"$tmp/state", Seq("_id"), Seq("name", "age"))
    val offsets = new FileOffsetStore(s"$tmp/offset")
    val pipeSource = new graft.pipe.CdcSource {
      def snapshot() = source.snapshot()
      def peekChanges(after: Long, limit: Long) = {
        val batch = source.peekChanges(after, limit)
        // project positional cols into named changelog columns
        import org.apache.spark.sql.functions._
        batch.select(
          col("seq"), col("op"),
          element_at(col("cols"), 1).as("_id"),
          element_at(col("cols"), 2).as("name"),
          element_at(col("cols"), 3).try_cast("long").as("age"))
      }
    }
    val pipe = new Pipe(
      PipeConfig(SourceConfig("mongodb"), TargetConfig("parquet"),
        peek_changes_limit = Some(2L)),
      pipeSource, sink, offsets, targetCols, tableName = "users")
    var applied = 0L
    var n = -1L
    while (n != 0L) {
      n = pipe.syncLoop(maxIterations = 1, sleeper = _ => ())
      if (n > 0) { source.commitToken(); applied += n }
    }
    assert(applied == 4)
    assert(tokens.read().contains("tok-4")) // committed after the last write

    val state = sink.read().orderBy("_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(state == Seq((oid(1).hex, "ada l.", 37L))) // oid(2) deleted
  }
}
