package graft.mongo

import org.scalatest.funsuite.AnyFunSuite
import graft.types.{BsonKind, CHType}

/** Pins FIXTURES.md sec B.3: first-type-wins, append-only, Unknown
  * deferral (reference: `src/pipes/mongodb.rs:588-648`). */
class MongoInferenceSpec extends AnyFunSuite with graft.SparkTestBase {
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

  test("inferFromDataFrame: column order by first typed value, null deferral, distributed") {
    import spark.implicits._
    // ord 1: only name typed; ord 2: age arrives; ord 3: late + nick arrive.
    // never_set is all-null → deferred. Column order must be first-typed
    // order (name, age, late/nick by field position), NOT schema order.
    val df = Seq(
      (1L, Option("a"), None: Option[Long], None: Option[String], None: Option[String]),
      (2L, Option("b"), Some(30L), None, None),
      (3L, None, Some(40L), Some("z"), Some("n"))
    ).toDF("ord", "name", "age", "late", "nick")
      .withColumn("never_set", org.apache.spark.sql.functions.lit(null).cast("string"))

    val inferred = MongoInference.inferFromDataFrame(df, "ord")
    assert(inferred.map(_.name) == Vector("_id", "name", "age", "late", "nick"))
    assert(inferred.find(_.name == "name").get.chType == CHType.CHStr.nullable)
    assert(inferred.find(_.name == "age").get.chType == CHType.Int64.nullable)
    assert(!inferred.exists(_.name == "never_set")) // Unknown deferral
  }

  test("inferFromDataFrame driver traffic is O(fields), not O(rows)") {
    import spark.implicits._
    val rows = (1L to 10000L).map(i => (i, s"v$i", if (i > 5000) Some(i) else None))
    val df = rows.toDF("ord", "s", "l").repartition(8)
    // the collected aggregation has exactly one element per typed field —
    // 2 here, against 10k rows
    val collected = MongoInference.firstTypedFields(df, "ord", Set.empty)
    assert(collected == Seq("s", "l"))
    val inferred = MongoInference.inferFromDataFrame(df, "ord")
    assert(inferred.map(_.name) == Vector("_id", "s", "l"))
  }

  test("inferFromDataFrame matches the ordered fold on the same data") {
    import spark.implicits._
    val data = Seq(
      (1L, None: Option[String], Some(1.5)),
      (2L, Some("x"), None)
    )
    val df = data.toDF("ord", "s", "d")
    val viaAgg = MongoInference.inferFromDataFrame(df, "ord")
    val viaFold = MongoInference.foldBatch(MongoInference.initialSchema,
      data.sortBy(_._1).map { case (_, s, d) =>
        Seq("s" -> s.map(MongoInference.kindOf).getOrElse(BNull),
            "d" -> d.map(MongoInference.kindOf).getOrElse(BNull))
      })
    assert(viaAgg == viaFold)
  }
}
