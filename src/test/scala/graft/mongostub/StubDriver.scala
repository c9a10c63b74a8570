package graft.mongostub

/** An offline stand-in for the handful of `com.mongodb.client` /
  * `org.bson` surfaces [[graft.mongo.LiveMongo.reflectiveTransport]]
  * reflects over (reference semantics: `src/adapter/mongodb.rs:169-257` —
  * collection-level watch, UpdateLookup after-images, resumeAfter
  * positioning, raw BSON documents). Class and method SIGNATURES mirror
  * the real driver exactly — `getMethod` lookups in the production glue
  * resolve against these one-for-one via the resolver seam — while the
  * behavior is a scripted server: a static recording of
  * (resume token, raw change document) pairs, plus counters that let the
  * spec assert cursor/client lifecycle discipline.
  *
  * Deliberately NOT in the `com.mongodb` package: squatting the real
  * coordinates would flip `LiveMongo.driverPresent` for the whole test
  * JVM and with it Main's live-vs-replay routing. The spec instead maps
  * names through `reflectiveTransport`'s `resolve` parameter.
  */
object StubServer {
  @volatile var recording: Vector[(String, Array[Byte])] = Vector.empty
  val opens = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
  @volatile var openCursors = 0
  @volatile var clientsOpen = 0
  @volatile var lastUri: String = ""
  @volatile var lastNamespace: String = ""
  @volatile var lastFullDocument: String = ""
  @volatile var watchedAs: Class[_] = null

  def reset(rec: Vector[(String, Array[Byte])]): Unit = synchronized {
    recording = rec; opens.clear(); openCursors = 0; clientsOpen = 0
    lastUri = ""; lastNamespace = ""; lastFullDocument = ""; watchedAs = null
  }
}

package bson {

  /** Mirrors `org.bson.BsonDocument` for the one use the glue has:
    * `BsonDocument.parse("""{"_data": "<token>"}""")`. */
  class BsonDocument(val resumeData: String)

  object BsonDocument {
    def parse(json: String): BsonDocument = {
      val m = """"_data"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(json)
      new BsonDocument(m.map(_.group(1)).getOrElse(
        sys.error(s"stub BsonDocument.parse: no _data in $json")))
    }
  }

  /** Mirrors `org.bson.ByteBuf`: the real buffer's backing array can be
    * larger than the document, so the stub pads BOTH ends — a glue that
    * copied the whole array instead of [position, limit) fails the
    * byte-identity assertion in the spec. */
  class StubByteBuf(backing: Array[Byte], pos: Int, lim: Int) {
    def array(): Array[Byte] = backing
    def position(): Int = pos
    def limit(): Int = lim
  }

  /** Mirrors `org.bson.RawBsonDocument` (the `Class` handed to
    * `getCollection`/`watch`, and the cursor's element type). */
  class RawBsonDocument(bytes: Array[Byte]) {
    def getByteBuffer(): StubByteBuf = {
      val backing = new Array[Byte](bytes.length + 7)
      System.arraycopy(bytes, 0, backing, 3, bytes.length)
      new StubByteBuf(backing, 3, 3 + bytes.length)
    }
  }
}

package changestream {

  /** Mirrors `com.mongodb.client.model.changestream.FullDocument` (a Java
    * enum in the driver; `valueOf` is all the glue calls). */
  class FullDocument(val name: String)

  object FullDocument {
    def valueOf(s: String): FullDocument = new FullDocument(s)
  }
}

package client {

  import graft.mongostub.bson.{BsonDocument, RawBsonDocument}
  import graft.mongostub.changestream.FullDocument

  object MongoClients {
    def create(uri: String): MongoClient = {
      StubServer.lastUri = uri
      StubServer.clientsOpen += 1
      new MongoClient
    }
  }

  class MongoClient {
    def getDatabase(name: String): MongoDatabase = new MongoDatabase(name)
    def close(): Unit = StubServer.clientsOpen -= 1
  }

  class MongoDatabase(dbName: String) {
    def getCollection(name: String, cls: Class[_]): MongoCollection = {
      StubServer.lastNamespace = s"$dbName.$name"
      new MongoCollection
    }
  }

  class MongoCollection {
    def watch(cls: Class[_]): ChangeStreamIterable = {
      StubServer.watchedAs = cls
      new ChangeStreamIterable
    }
  }

  /** Fluent config then `cursor()`, like the driver: the cursor serves
    * the recording strictly AFTER the `resumeAfter` token. */
  class ChangeStreamIterable {
    private var resume: Option[String] = None
    def fullDocument(fd: FullDocument): ChangeStreamIterable = {
      StubServer.lastFullDocument = fd.name; this
    }
    def resumeAfter(doc: BsonDocument): ChangeStreamIterable = {
      resume = Some(doc.resumeData); this
    }
    def cursor(): MongoCursor = {
      StubServer.opens += resume
      val rec = StubServer.recording
      val start = resume.map(t => rec.indexWhere(_._1 == t) + 1).getOrElse(0)
      new MongoCursor(rec.drop(start).map(_._2))
    }
  }

  /** `tryNext` returns null once drained — the live driver's
    * nothing-pending signal the peek protocol keys off. */
  class MongoCursor(docs: Vector[Array[Byte]]) {
    StubServer.openCursors += 1
    private var at = 0
    def tryNext(): RawBsonDocument =
      if (at < docs.length) { val d = docs(at); at += 1; new RawBsonDocument(d) }
      else null
    def close(): Unit = StubServer.openCursors -= 1
  }
}
