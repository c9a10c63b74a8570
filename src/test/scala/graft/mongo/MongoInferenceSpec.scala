package graft.mongo

import org.scalatest.funsuite.AnyFunSuite
import graft.types.{BsonKind, CHType}

/** Pins FIXTURES.md sec B.3: first-type-wins, append-only, Unknown
  * deferral (reference: `src/pipes/mongodb.rs:588-648`). */
class MongoInferenceSpec extends AnyFunSuite {
  import BsonKind._

  test("mongo_profiles document sequence: first-type-wins, deferral, order") {
    var s = MongoInference.initialSchema
    assert(s.map(_.name) == Vector("_id"))
    assert(s.head.isPrimaryKey && s.head.chType == CHType.CHStr)

    // doc1: name String, age Int32
    s = MongoInference.foldBatch(s, Seq(Seq("_id" -> BObjectId, "name" -> BString, "age" -> BInt32)))
    assert(s.map(_.name) == Vector("_id", "name", "age"))
    assert(s(1).chType == CHType.CHStr.nullable)
    assert(s(2).chType == CHType.Int32.nullable)

    // doc2: name arrives as Int32 — conflict ignored, stays String
    s = MongoInference.foldBatch(s, Seq(Seq("_id" -> BObjectId, "name" -> BInt32)))
    assert(s(1).chType == CHType.CHStr.nullable)

    // doc3: nickname null — NOT created (Unknown deferral)
    s = MongoInference.foldBatch(s, Seq(Seq("_id" -> BObjectId, "nickname" -> BNull)))
    assert(!s.exists(_.name == "nickname"))

    // doc4: nickname typed now, joined DateTime, score Double
    s = MongoInference.foldBatch(s, Seq(Seq(
      "_id" -> BObjectId, "nickname" -> BString,
      "joined" -> BDateTime, "score" -> BDouble)))
    assert(s.map(_.name) == Vector("_id", "name", "age", "nickname", "joined", "score"))
    assert(s(3).chType == CHType.CHStr.nullable)
    assert(s(4).chType == CHType.CHDateTime().nullable)
    assert(s(5).chType == CHType.Float64.nullable)

    // doc5: tags array, blob binary->String, did ObjectId->String
    s = MongoInference.foldBatch(s, Seq(Seq(
      "_id" -> BObjectId, "tags" -> BArray, "blob" -> BBinary, "did" -> BObjectId)))
    assert(s.find(_.name == "tags").get.chType == CHType.Unknown.array)
    assert(s.find(_.name == "blob").get.chType == CHType.CHStr.nullable)
    assert(s.find(_.name == "did").get.chType == CHType.CHStr.nullable)
  }

  test("fold is order-dependent (first type wins, not widening)") {
    val intFirst = MongoInference.foldBatch(MongoInference.initialSchema,
      Seq(Seq("x" -> BInt32), Seq("x" -> BString)))
    val strFirst = MongoInference.foldBatch(MongoInference.initialSchema,
      Seq(Seq("x" -> BString), Seq("x" -> BInt32)))
    assert(intFirst.find(_.name == "x").get.chType == CHType.Int32.nullable)
    assert(strFirst.find(_.name == "x").get.chType == CHType.CHStr.nullable)
  }
}
