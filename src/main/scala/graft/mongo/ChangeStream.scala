package graft.mongo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.pipe.{CdcSource, ResumeTokenStore}

/** One decoded MongoDB change-stream event — the field subset the
  * reference consumes (`/root/reference/src/adapter/mongodb.rs:169-341`):
  * `operationType`, `ns.{db,coll}`, `documentKey._id`, the UpdateLookup
  * `fullDocument` after-image, and the opaque `_id._data` resume token.
  */
case class ChangeStreamEvent(
    opType: String,
    db: String,
    collection: String,
    documentKeyId: Option[BsonValue],
    fullDocument: Option[BsonValue.BDoc],
    resumeToken: Option[String])

object ChangeStream {
  import BsonValue._

  /** Decode one raw change-stream document. Pure, executor-safe. */
  def decode(bytes: Array[Byte]): ChangeStreamEvent = {
    val doc = Bson.decodeDocument(bytes)
    val ns = doc.get("ns").collect { case d: BDoc => d }
    def nsStr(k: String) =
      ns.flatMap(_.get(k)).collect { case BStr(s) => s }.getOrElse("")
    ChangeStreamEvent(
      opType = doc.get("operationType").collect { case BStr(s) => s }.getOrElse(""),
      db = nsStr("db"),
      collection = nsStr("coll"),
      documentKeyId = doc.get("documentKey")
        .collect { case d: BDoc => d }.flatMap(_.get("_id")),
      fullDocument = doc.get("fullDocument").collect { case d: BDoc => d },
      resumeToken = doc.get("_id").collect { case d: BDoc => d }
        .flatMap(_.get("_data")).flatMap(Bson.scalarText))
  }

  /** Event → changelog row, the reference's op routing
    * (`src/pipes/mongodb.rs:294-341`):
    *  - insert / replace → upsert with the full document;
    *  - update → upsert from the UpdateLookup after-image (events whose
    *    after-image is missing — document deleted before the lookup —
    *    drop, like the reference's warn-and-skip);
    *  - delete → delete with the key ONLY (D8);
    *  - drop / dropDatabase → truncate;
    *  - anything else (invalidate, rename) → skipped.
    * Values render positionally into `columns` with [[Bson.scalarText]];
    * `_id` renders by the P8/P10 rules (ObjectId → hex).
    */
  def toChangelogRow(
      e: ChangeStreamEvent, columns: Seq[String]): Option[(String, Seq[String])] = {
    def fields(doc: Option[BDoc]): Seq[String] = {
      val byName = doc.map(_.fields.toMap).getOrElse(Map.empty)
      columns.map { c =>
        val v = if (c == "_id") e.documentKeyId.orElse(byName.get(c)) else byName.get(c)
        v.flatMap(Bson.scalarText).orNull
      }
    }
    e.opType match {
      case "insert" | "replace"          => Some(("I", fields(e.fullDocument)))
      case "update" if e.fullDocument.isDefined => Some(("U", fields(e.fullDocument)))
      case "update"                      => None // after-image gone: skip
      case "delete"                      => Some(("D", fields(None)))
      case "drop" | "dropDatabase"       => Some(("T", columns.map(_ => null: String)))
      case _                             => None
    }
  }
}

/** Live Mongo change-stream source behind the [[CdcSource]] seam. The
  * transport is a callback `fetch(resumeAfter, limit) → raw BSON docs` —
  * a live client wraps its `watch` cursor there; specs drive it with
  * [[Bson.encodeDocument]] fixtures.
  *
  * Offset model: Mongo orders by OPAQUE resume tokens, not numbers, so
  * the Long seq is a per-source running index; the real recovery cursor
  * is the resume token, persisted through [[ResumeTokenStore]] by
  * [[commitToken]] AFTER the sink write (at-least-once, reference:
  * `src/adapter/mongodb.rs:259-302`). A peek re-fetches from the LAST
  * COMMITTED token, so an uncommitted batch replays identically — the
  * same non-consuming contract as the PG slot peek.
  *
  * Decode runs ON EXECUTORS: the driver holds ≤ one bounded batch of raw
  * frames (the peek quantum), ships them as a Dataset, and the BSON parse
  * + row mapping distribute.
  */
class MongoChangeStreamSource(
    fetch: (Option[String], Long) => Seq[Array[Byte]],
    tokens: ResumeTokenStore,
    columns: () => Seq[String],
    snapshotDf: () => DataFrame,
    onWindow: Seq[ChangeStreamEvent] => Unit = _ => ()
)(implicit spark: SparkSession) extends CdcSource {

  @volatile private var lastPeek: Option[String] = None // token to commit

  override def snapshot(): DataFrame = snapshotDf()

  override def peekChanges(after: Long, limit: Long): DataFrame = {
    // `onWindow` fires once per fetched window with the decoded events
    // BEFORE rows are routed — the per-batch schema-evolution hook
    // (reference: `src/pipes/mongodb.rs:306-333` runs ADD COLUMN on each
    // batch's rows before generating its INSERTs). `columns()` is then
    // read AFTER the hook, so fields first seen in this window land for
    // this window's rows; earlier rows are never backfilled.
    var raw = fetch(tokens.read(), limit)
    var decoded = raw.map(ChangeStream.decode)
    onWindow(decoded)
    // Skip-forward: a window whose events ALL route to nothing (invalidate,
    // rename, update with a missed lookup) produces no writes, so its token
    // commits IMMEDIATELY — otherwise the pipe would see an empty batch,
    // never reach its write-commit point, and refetch the same window
    // forever. Writes-bearing windows still commit only via commitToken
    // (after the sink write).
    while (raw.nonEmpty &&
        !decoded.exists(e => ChangeStream.toChangelogRow(e, columns()).isDefined)) {
      val skipToken = decoded.reverseIterator.flatMap(_.resumeToken).take(1).toSeq
      // a window with NO extractable resume token cannot advance the
      // cursor: refetching would return the identical window forever.
      // Every real change-stream document carries `_id` (the token), so
      // this is a corrupt recording / decoder anomaly — fail loudly
      // instead of spinning.
      if (skipToken.isEmpty) throw new IllegalStateException(
        s"change-stream window of ${raw.size} non-routable event(s) carries no " +
          "resume token; cannot advance past it (corrupt stream recording?)")
      skipToken.foreach(tokens.write)
      raw = fetch(tokens.read(), limit)
      decoded = raw.map(ChangeStream.decode)
      onWindow(decoded)
    }
    // the token to persist at commit = the LAST event in the window that
    // carries one (never a stale value from a previous peek)
    lastPeek = decoded.reverseIterator.flatMap(_.resumeToken).take(1)
      .toSeq.headOption

    val schema = StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("table", StringType, nullable = true),
      StructField("cols", ArrayType(StringType, containsNull = true), nullable = false)))
    val cols = columns() // resolve the evolved list; serializable capture
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    import spark.implicits._
    val base = after
    spark.createDataset(raw.zipWithIndex.map { case (b, i) => (base + i + 1, b) })
      .flatMap { case (seq, bytes) =>
        val e = ChangeStream.decode(bytes)
        ChangeStream.toChangelogRow(e, cols).map { case (op, values) =>
          Row(seq, op, e.collection, values)
        }
      }(enc)
  }

  /** The at-least-once commit: persist the last peeked batch's resume
    * token once its writes succeeded. */
  def commitToken(): Unit = lastPeek.foreach(tokens.write)
}

object ChangeStreamRows {
  /** Project the positional `(seq, op, table, cols)` changelog into named,
    * typed columns for a target schema (the Mongo analogue of
    * [[graft.live.PgOutputJdbcSource.tableSlice]]). */
  def tableSlice(
      decoded: DataFrame,
      columns: Seq[graft.types.CHColumn]): DataFrame = {
    import org.apache.spark.sql.functions._
    decoded.select(
      (Seq(col("seq"), col("op")) ++ columns.zipWithIndex.map { case (c, i) =>
        element_at(col("cols"), i + 1)
          .try_cast(graft.types.CHType.toSparkType(c.chType)).as(c.name)
      }): _*)
  }
}

/** mongodump-format file reader: a `.bson` file is nothing but
  * concatenated BSON documents, each self-delimiting via its leading
  * little-endian int32 length — the public dump/wire format. Used as the
  * replay transport behind [[MongoChangeStreamSource]] (record a change
  * stream once, replay it without a server). */
object BsonFile {
  def splitDocuments(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var off = 0
    while (off + 4 <= bytes.length) {
      val len = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      require(len >= 5 && off + len <= bytes.length, s"torn BSON document at offset $off")
      out += java.util.Arrays.copyOfRange(bytes, off, off + len)
      off += len
    }
    out.result()
  }

  def readDocuments(path: String): Vector[Array[Byte]] =
    splitDocuments(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
