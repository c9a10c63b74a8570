package graft.mongo

/** Live MongoDB change-stream transport behind a CLASSPATH PROBE: the
  * offline build has no MongoDB driver jar, so the driver API is reached
  * purely by reflection against its PUBLIC interfaces — the build stays
  * green without the jar, and `source_type: mongodb` without `bson_dir`
  * goes live the moment `org.mongodb:mongodb-driver-sync` (+ `bson`,
  * `mongodb-driver-core`) lands on the classpath (docs/MIGRATION.md).
  *
  * Shape mirrors the reference's client (`src/adapter/mongodb.rs:39-61`
  * client construction with `app_name`; `:169-257` `watch` with
  * UpdateLookup after-images and `resume_after`): one long-lived client,
  * one change-stream cursor per peek window opened at the committed
  * resume token, events fetched as RAW BSON so the downstream decode is
  * byte-identical to the replay transport.
  *
  * Split for testability (LiveMongoPipeSpec): [[fetchCallback]] is the
  * transport-AGNOSTIC peek protocol (open at token → drain ≤ limit →
  * close) over a [[CursorOpener]] seam; [[reflectiveTransport]] is the
  * driver-backed opener. The spec scripts the opener and drives the
  * production protocol; only the reflection shim itself needs a real
  * server + jar.
  */
object LiveMongo {

  /** One opened change-stream cursor: `tryNext` returns the next raw
    * change document, or None when the server has nothing pending
    * (the peek window ends — the reference's non-blocking drain). */
  trait ChangeCursor extends AutoCloseable {
    def tryNext(): Option[Array[Byte]]
  }

  /** Opens a cursor positioned AFTER the given resume token (None =
    * stream head). */
  type CursorOpener = Option[String] => ChangeCursor

  /** True when the MongoDB sync driver is on the classpath. */
  def driverPresent: Boolean =
    try { Class.forName("com.mongodb.client.MongoClients"); true }
    catch { case _: Throwable => false }

  /** The peek protocol over any cursor transport: open at the committed
    * token, drain at most `limit` pending events, close the cursor. A
    * fresh cursor per window keeps the fetch stateless between peeks —
    * exactly the replay transport's contract, so MongoPipe's at-least-
    * once commit ordering (token persists only after the write) holds
    * unchanged. */
  def fetchCallback(open: CursorOpener): (Option[String], Long) => Seq[Array[Byte]] =
    (resume, limit) => {
      val cur = open(resume)
      try {
        val out = Vector.newBuilder[Array[Byte]]
        var n = 0L
        var drained = false
        while (n < limit && !drained) {
          cur.tryNext() match {
            case Some(bytes) => out += bytes; n += 1
            case None => drained = true
          }
        }
        out.result()
      } finally cur.close()
    }

  private def jarHint: String =
    "live MongoDB needs org.mongodb:mongodb-driver-sync (+ bson, " +
      "mongodb-driver-core) on the classpath, or set " +
      "source.mongodb.bson_dir to replay a recorded change stream " +
      "(docs/MIGRATION.md)"

  /** Connection string in the reference's form
    * (`src/adapter/mongodb.rs:39-55`), with `app_name` riding the URI's
    * `appName` option (the settings-builder equivalent, minus a second
    * reflection surface). */
  private[graft] def uri(
      host: String, port: Int, username: String, password: String,
      appName: Option[String]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val creds = if (username.nonEmpty) s"${enc(username)}:${enc(password)}@" else ""
    val app = appName.map(a => s"/?appName=${enc(a)}").getOrElse("")
    s"mongodb://$creds$host:$port$app"
  }

  /** Driver-backed transport for ONE collection's change stream: returns
    * the cursor opener plus the client's closer (close it when the pipe
    * exits). All driver types are resolved reflectively against the
    * PUBLIC client interfaces (implementation classes are
    * package-private — invoking through them throws
    * IllegalAccessException). Fails with the jar hint when the driver is
    * absent.
    *
    * `resolve` is the class-resolution seam: production uses the default
    * (`Class.forName` against the real driver jar); LiveMongoPipeSpec
    * substitutes a name-mapping into an offline stub driver so every
    * getMethod/invoke in this glue executes under test. Only the
    * resolution is swappable — the reflective calls themselves are always
    * the production code. */
  def reflectiveTransport(
      connUri: String, database: String, collection: String,
      resolve: String => Class[_] = Class.forName(_)): (CursorOpener, AutoCloseable) = {

    def iface(name: String): Class[_] =
      try resolve(name)
      catch {
        // Only the two missing-class cases map to the jar hint:
        // ClassNotFoundException (driver absent) and NoClassDefFoundError
        // (driver-sync present but driver-core/bson missing). Broader
        // LinkageError — e.g. ExceptionInInitializerError from a genuine
        // driver static-init failure — must NOT be masked as a packaging
        // problem; it propagates. The original is chained either way.
        case e @ (_: ClassNotFoundException | _: NoClassDefFoundError) =>
          throw new IllegalStateException(jarHint, e)
      }
    val clientsCls = iface("com.mongodb.client.MongoClients")
    val clientIf = iface("com.mongodb.client.MongoClient")
    val dbIf = iface("com.mongodb.client.MongoDatabase")
    val collIf = iface("com.mongodb.client.MongoCollection")
    val csIterIf = iface("com.mongodb.client.ChangeStreamIterable")
    val cursorIf = iface("com.mongodb.client.MongoCursor")
    val fullDocCls = iface("com.mongodb.client.model.changestream.FullDocument")
    val bsonDocCls = iface("org.bson.BsonDocument")
    val rawDocCls = iface("org.bson.RawBsonDocument")

    val client = clientsCls.getMethod("create", classOf[String])
      .invoke(null, connUri)
    val db = clientIf.getMethod("getDatabase", classOf[String])
      .invoke(client, database)
    val coll = dbIf.getMethod("getCollection", classOf[String], classOf[Class[_]])
      .invoke(db, collection, rawDocCls)
    val updateLookup = fullDocCls.getMethod("valueOf", classOf[String])
      .invoke(null, "UPDATE_LOOKUP")

    val opener: CursorOpener = resume => {
      // collection-level watch, raw change documents (S4 UpdateLookup
      // after-images; one token per collection = our token-file model)
      val iterable = collIf.getMethod("watch", classOf[Class[_]])
        .invoke(coll, rawDocCls)
      csIterIf.getMethod("fullDocument", fullDocCls)
        .invoke(iterable, updateLookup)
      resume.foreach { t =>
        val tok = bsonDocCls.getMethod("parse", classOf[String])
          .invoke(null, s"""{"_data": "$t"}""")
        csIterIf.getMethod("resumeAfter", bsonDocCls).invoke(iterable, tok)
      }
      val cursor = csIterIf.getMethod("cursor").invoke(iterable)
      new ChangeCursor {
        def tryNext(): Option[Array[Byte]] =
          Option(cursorIf.getMethod("tryNext").invoke(cursor)).map { raw =>
            val buf = rawDocCls.getMethod("getByteBuffer").invoke(raw)
            val bufCls = buf.getClass
            // org.bson.ByteBuf: copy exactly [position, limit) — the
            // backing array can be larger than the document
            val arr = bufCls.getMethod("array").invoke(buf).asInstanceOf[Array[Byte]]
            val pos = bufCls.getMethod("position").invoke(buf).asInstanceOf[Int]
            val lim = bufCls.getMethod("limit").invoke(buf).asInstanceOf[Int]
            java.util.Arrays.copyOfRange(arr, pos, lim)
          }
        def close(): Unit = {
          cursorIf.getMethod("close").invoke(cursor); ()
        }
      }
    }
    val closer = new AutoCloseable {
      def close(): Unit = {
        clientIf.getMethod("close").invoke(client); ()
      }
    }
    (opener, closer)
  }
}
